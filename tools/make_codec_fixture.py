"""Regenerate the codec-surface golden fixture and its oracle.

Builds ``youtube_api_data_etl_automation_spark/fixtures/codec_payloads.parquet``
— a deterministic corpus of encoder-built payloads covering the full
decode/probe matrix — then runs :func:`plans.codec_check.codec_stats`
once and freezes the result as a DuckDB VALUES literal in
``youtube_api_data_etl_automation_spark/plans/codec_golden.py``.

The payload encoders are the independent test-side encoders
(tests/test_operators.py, tests/test_jpeg.py, tests/test_gif.py,
tests/test_mediameta.py) that already pin the decoders byte-exactly in
pytest; this tool promotes that signal to the driver's CORRECTNESS gate.

Run after any INTENDED change to a decoder/probe's behavior:

    python tools/make_codec_fixture.py
"""

from __future__ import annotations

import math
import os
import struct
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def build_payloads() -> list[tuple[int, str, str, bytes]]:
    """(payload_id, family, name, payload) for the whole matrix."""
    import numpy as np
    from test_gif import PAL4, _gif
    from test_jpeg import _encode_jpeg, _encode_progressive, _rng_image
    from test_mediameta import _box, _mp4, _trak, _webp
    from test_operators import (
        _bmp24,
        _ima_encode,
        _ms_adpcm_encode,
        _png,
        _ppm6,
        _wav,
    )

    rows: list[tuple[int, str, str, bytes]] = []

    def add(pid, family, name, payload):
        rows.append((pid, family, name, bytes(payload)))

    # ---- images: decode_image (ids 1xx) ------------------------------
    grad = [[(x * 9 % 256, y * 31 % 256, (x + y) * 17 % 256)
             for x in range(6)] for y in range(4)]
    add(101, "image", "png_rgb8_filters", _png(grad, filters=[0, 1, 2, 3, 4]))
    add(102, "image", "png_palette",
        _png([[0, 1, 2, 3]] * 4, color_type=3, palette=PAL4))
    add(103, "image", "png_grey16",
        _png([[(v * 257,) for v in (0, 80, 160, 240, 255)]] * 3,
             color_type=0, depth=16))
    add(104, "image", "png_grey_alpha",
        _png([[(g, 255 - g) for g in (0, 60, 120, 250)]] * 4, color_type=4))
    add(105, "image", "png_adam7",
        _png([[((x * 23 + y * 11) % 256,) * 3 for x in range(9)]
              for y in range(9)], interlace=1, filters=[0, 1, 2, 3, 4]))
    add(106, "image", "png_grey2",
        _png([[(v,) for v in (0, 1, 2, 3, 3, 2, 1, 0)]] * 2,
             color_type=0, depth=2))
    add(107, "image", "jpeg_base_grey",
        _encode_jpeg(_rng_image(16, 16, seed=41, grey=True))[0])
    add(108, "image", "jpeg_base_color",
        _encode_jpeg(_rng_image(16, 24, seed=42))[0])
    add(109, "image", "jpeg_progressive",
        _encode_progressive(_rng_image(8, 16, seed=43, grey=True))[0])
    add(110, "image", "jpeg_restart",
        _encode_jpeg(_rng_image(24, 24, seed=44, grey=True),
                     restart_interval=2)[0])
    add(111, "image", "gif_first_frame",
        _gif([[0, 1, 2, 3, 2, 1]] * 4, PAL4))
    add(112, "image", "bmp24",
        _bmp24([[(1, 2, 3), (4, 5, 6), (7, 8, 9)],
                [(10, 11, 12), (13, 14, 15), (16, 17, 18)]]))
    add(113, "image", "ppm_p6", _ppm6([[(9, 8, 7), (6, 5, 4)]] * 2))
    add(114, "image", "jpeg_arithmetic_unsupported",
        _encode_jpeg(_rng_image(8, 8, seed=45, grey=True),
                     sof_marker=0xC9)[0])
    add(115, "image", "jpeg_truncated_corrupt",
        _encode_jpeg(_rng_image(8, 8, seed=46, grey=True))[0][:40])
    add(116, "image", "webp_vp8_lossy_unsupported",
        _webp(b"VP8 ", b"\x00" * 6
              + struct.pack("<HH", 32 | 0x4000, 16) + b"\x00" * 8))
    from test_vp8l import _encode_vp8l, _rgba

    add(117, "image", "webp_vp8l_lossless",
        _encode_vp8l(_rgba(6, 5, seed=99), subtract_green=True,
                     cache_bits=4))
    from test_tiff import _img as _tiff_img
    from test_tiff import _tiff_image

    add(119, "image", "tiff_rgb_bigendian",
        _tiff_image(_tiff_img(4, 6, seed=51), order=">"))
    add(120, "image", "tiff_grey_packbits_strips",
        _tiff_image(
            np.repeat(_tiff_img(2, 9, seed=52, grey=True), 4, axis=0),
            packbits=True, rows_per_strip=3))
    add(123, "image", "tiff_deflate_rgb_predictor",
        _tiff_image(_tiff_img(7, 12, seed=55), deflate=True,
                    predictor=2))
    import numpy as _np
    _pal_rng = _np.random.default_rng(56)
    _tpal = _pal_rng.integers(0, 256, size=(16, 3)).astype(_np.uint8)
    _tidx = _pal_rng.integers(0, 16, size=(6, 10)).astype(_np.uint8)
    add(124, "image", "tiff_palette_lzw",
        _tiff_image(_tidx, palette=_tpal, lzw=True))
    from test_bmp_pnm import _bmp32, _bmp_pal, _bmp_rle8, _pal
    _bpal = _pal(16, seed=57)
    _bidx = (_np.arange(5 * 8).reshape(5, 8) % 16).astype(_np.uint8)
    add(125, "image", "bmp_palette_4bit", _bmp_pal(_bidx, _bpal, bpp=4))
    add(126, "image", "bmp_rle8", _bmp_rle8(_bidx, _bpal))
    add(127, "image", "bmp_32bit",
        _bmp32(_np.arange(3 * 4 * 3).reshape(3, 4, 3) % 256))
    add(128, "image", "pgm_binary",
        b"P5\n9 5\n255\n" + bytes((i * 7) % 256 for i in range(45)))
    add(129, "image", "pbm_bitmap",
        b"P4\n10 3\n" + bytes((0b10110100, 0b01000000,
                               0b01011011, 0b11000000,
                               0b11100010, 0b10000000)))
    add(130, "image", "tiff_tiled_lzw_predictor",
        _tiff_image(_tiff_img(37, 45, seed=58), tiles=(16, 16),
                    lzw=True, predictor=2))
    # r13: CCITT bilevel fax TIFFs (operators/ccitt.py via tiff.py)
    import random as _ccitt_rng_mod
    from test_ccitt import _encode_g4 as _ccitt_g4_enc  # noqa: F401
    from test_ccitt import _rand_img as _ccitt_rand
    from test_ccitt import _tiff_ccitt

    _crng = _ccitt_rng_mod.Random(1313)
    _cimg = _ccitt_rand(_crng, 18, 41)
    add(132, "image", "tiff_ccitt_g4_strips",
        _tiff_ccitt(_cimg, compression=4, rows_per_strip=7))
    add(133, "image", "tiff_ccitt_mh",
        _tiff_ccitt(_cimg, compression=2, photometric=0))
    # r14: standalone JBIG2 file (sequential organization, MMR page)
    # through decode_image — the same bitmap as the CCITT pair, so a
    # cross-codec fingerprint anchor rides for free
    from test_jbig2 import _page_info as _jb2_page
    from test_jbig2 import _region as _jb2_region
    from test_jbig2 import _seg as _jb2_seg
    add(134, "image", "jbig2_file_sequential_mmr",
        b"\x97JB2\r\n\x1a\n\x03"
        + _jb2_seg(0, 48, 1, _jb2_page(41, 18))
        + _jb2_seg(1, 39, 1, _jb2_region(_cimg))
        + _jb2_seg(2, 51, 1, b""))
    from test_tiff import _split_jpeg_tables

    _jt_stream = _encode_jpeg(_rng_image(8, 16, seed=59))[0]
    _jt_tables, _jt_abbr = _split_jpeg_tables(_jt_stream)
    add(131, "image", "tiff_jpeg_shared_tables",
        _tiff_image(np.zeros((16, 16, 3), dtype=np.uint8),
                    photometric=6, rows_per_strip=8,
                    jpeg_chunks=[_jt_abbr, _jt_abbr],
                    jpeg_tables=_jt_tables))
    add(121, "image", "tiff_lzw_rgb",
        _tiff_image(_tiff_img(11, 13, seed=53), lzw=True))
    add(122, "image", "tiff_lzw_predictor_grey_strips",
        _tiff_image(_tiff_img(9, 17, seed=54, grey=True), lzw=True,
                    predictor=2, rows_per_strip=4))
    add(118, "image", "webp_vp8l_palette_predictor",
        _encode_vp8l(
            np.array([[((x * 37) % 2 * 200, (y * 53) % 3 * 80, 40, 255)
                       for x in range(9)] for y in range(5)],
                     dtype=np.int64),
            palette=True))

    # ---- audio: decode_audio (ids 2xx) -------------------------------
    sin16 = [(int(12000 * math.sin(i / 3.0)),
              int(-9000 * math.cos(i / 5.0))) for i in range(64)]
    add(201, "audio", "wav_pcm16_stereo", _wav(8000, sin16))
    add(202, "audio", "wav_pcm8",
        _wav(11025, [((128 + int(100 * math.sin(i / 4.0))),)
                     for i in range(40)], bits=8))
    add(203, "audio", "wav_pcm24",
        _wav(16000, [(int(4_000_000 * math.sin(i / 6.0)),)
                     for i in range(32)], bits=24))
    add(204, "audio", "wav_pcm32",
        _wav(48000, [(int(1_000_000_000 * math.sin(i / 7.0)),)
                     for i in range(24)], bits=32))
    add(205, "audio", "wav_float32",
        _wav(22050, [(math.sin(i / 3.0) * 0.5,) for i in range(30)],
             bits=32, fmt_code=3))
    add(206, "audio", "wav_float64",
        _wav(22050, [(math.cos(i / 9.0) * 0.25,) for i in range(20)],
             bits=64, fmt_code=3))
    g711_codes = bytes(range(0, 256, 8))  # 32 codes across the LUT
    add(207, "audio", "wav_alaw",
        _wav(8000, [(0,)], bits=8, fmt_code=6, raw_data=g711_codes))
    add(208, "audio", "wav_ulaw",
        _wav(8000, [(0,)], bits=8, fmt_code=7, raw_data=g711_codes))
    ima_wave = [int(6000 * math.sin(i / 2.0)) for i in range(16)]
    ima_data, _ = _ima_encode([ima_wave], block_align=8)
    add(209, "audio", "wav_ima_adpcm",
        _wav(8000, [(0,)], bits=4, fmt_code=0x11, block_align=8,
             raw_data=ima_data))
    ms_wave = [int(5000 * math.sin(i / 2.5)) for i in range(20)]
    ms_data, _ = _ms_adpcm_encode([ms_wave], block_align=11)
    add(210, "audio", "wav_ms_adpcm",
        _wav(8000, [(0,)], bits=4, fmt_code=2, block_align=11,
             raw_data=ms_data))
    add(211, "audio", "mp3_unsupported",
        b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\xff\xfb\x90\x00" * 8)
    add(212, "audio", "wav_truncated_corrupt", _wav(8000, sin16)[:30])
    from test_flac import _flac, _wave

    add(213, "audio", "flac_fixed_stereo_midside",
        _flac([_wave(50, 9000), _wave(50, 7000, phase=0.5)], rate=16000,
              ch_mode="mid_side", sub_kw={"kind": "fixed", "order": 3}))
    add(214, "audio", "flac_lpc_multiframe",
        _flac([_wave(48, 5000)], frames_of=[16, 32],
              sub_kw={"kind": "lpc",
                      "lpc": ([3 << 4, -(3 << 3), 1 << 2], 4, 8)}))
    add(215, "audio", "flac_crc_corrupt",
        _flac([_wave(24, 800)], sub_kw={"kind": "fixed", "order": 1})[:-1]
        + b"\x00")

    # ---- image headers: image_meta (ids 3xx) -------------------------
    add(301, "image_meta", "probe_png", _png(grad))
    add(302, "image_meta", "probe_jpeg_progressive",
        _encode_progressive(_rng_image(8, 16, seed=47, grey=True))[0])
    add(303, "image_meta", "probe_gif", _gif([[0, 1, 2]] * 2, PAL4))
    add(304, "image_meta", "probe_bmp", _bmp24([[(1, 2, 3), (4, 5, 6)]]))
    # header-only contract: huge declared dims, zero pixel bytes
    add(305, "image_meta", "probe_ppm_header_only", b"P6\n4000 3000\n255\n")
    add(306, "image_meta", "probe_webp_vp8",
        _webp(b"VP8 ", b"\x00" * 6
              + struct.pack("<HH", 320 | 0x4000, 240) + b"\x00" * 8))
    add(307, "image_meta", "probe_webp_vp8l",
        _webp(b"VP8L", bytes([0x2F])
              + struct.pack("<I", (99 - 1) | ((77 - 1) << 14))
              + b"\x00" * 8))
    add(308, "image_meta", "probe_webp_vp8x",
        _webp(b"VP8X", b"\x00" * 4 + (1919).to_bytes(3, "little")
              + (1079).to_bytes(3, "little") + b"\x00" * 8))
    add(309, "image_meta", "probe_unknown_unsupported", b"\x00\x01junk")
    add(310, "image_meta", "probe_png_truncated_corrupt",
        _png(grad)[:20])

    # ---- video containers: video_meta (ids 4xx) ----------------------
    add(401, "video_meta", "mp4_v0_two_tracks",
        _mp4(timescale=600, duration=1500,
             tracks=(_trak(b"vide", b"avc1", w=1920, h=1080),
                     _trak(b"soun", b"mp4a"))))
    add(402, "video_meta", "mp4_v1_largesize",
        _mp4(timescale=90_000, duration=90_000 * 7, mvhd_version=1,
             tracks=(_trak(b"vide", b"hvc1", w=640, h=360,
                           tkhd_version=1),),
             largesize_moov=True))
    add(403, "video_meta", "mp4_truncated_corrupt",
        _mp4(tracks=(_trak(b"vide", b"avc1", w=16, h=16),))[:-10])
    from test_mediameta import _avi, _ogg_page

    add(404, "video_meta", "avi_two_tracks",
        _avi(tracks=((b"vids", b"XVID"), (b"auds", b"mp3 ")), w=320,
             h=240, us_per_frame=40_000, total_frames=250))
    add(409, "video_meta", "raw_stream_unsupported",
        b"\x00\x01rawstream" + b"\x00" * 16)
    from test_mediameta import _animated_gif

    add(410, "video_meta", "gif_animated_3_frames",
        _animated_gif([[[0, 1, 2]] * 2, [[1, 2, 3]] * 2,
                       [[3, 0, 1]] * 2], PAL4, delays_cs=[10, 20, 30]))
    add(411, "video_meta", "gif_static_single_frame",
        _gif([[0, 1, 2, 3]] * 3, PAL4))
    add(412, "video_meta", "mp4_stsz_frame_count",
        _mp4(timescale=600, duration=1500,
             tracks=(_trak(b"vide", b"avc1", w=320, h=240, n_samples=75),
                     _trak(b"soun", b"mp4a", n_samples=1200))))
    from test_mediameta import _apng
    add(413, "video_meta", "apng_animated", _apng())
    from test_operators import _png as _png_op
    add(414, "video_meta", "png_static_one_frame",
        _png_op([[(9, 8, 7)] * 3] * 2))
    add(405, "video_meta", "mp4_short_mvhd_corrupt",
        _box(b"ftyp", b"isom" + b"\x00" * 8)
        + _box(b"moov", _box(b"mvhd", bytes([0, 0, 0, 0]))))
    from test_mediameta import _mkv, _mkv_track

    add(406, "video_meta", "mkv_two_tracks",
        _mkv(duration=5000.0,
             tracks=(_mkv_track(1, b"V_VP9", w=640, h=360),
                     _mkv_track(2, b"A_OPUS"))))
    add(407, "video_meta", "mkv_unknown_size_segment",
        _mkv(duration=3000.0, tscale=2_000_000, unknown_size=True))
    add(408, "video_meta", "mkv_truncated_corrupt",
        _mkv(duration=1000.0,
             tracks=(_mkv_track(1, b"V_AV1", w=32, h=32),))[:-3])

    # ---- audio headers: audio_meta (ids 5xx) -------------------------
    from test_mediameta import _id3v2, _mp3_frame_header

    add(501, "audio_meta", "mp3_cbr_id3",
        _id3v2() + _mp3_frame_header() + b"\x00" * 1996)
    add(502, "audio_meta", "mp3_xing_vbr",
        _mp3_frame_header() + b"\x00" * 32
        + b"Xing" + struct.pack(">II", 1, 100) + b"\x00" * 64)
    add(503, "audio_meta", "mp3_mpeg25_mono",
        _mp3_frame_header(bitrate_idx=4, rate_idx=2, stereo=False,
                          version_bits=0) + b"\x00" * 996)
    flac_packed = (44100 << 44) | ((2 - 1) << 41) | ((16 - 1) << 36) | 88200
    add(504, "audio_meta", "flac_streaminfo",
        b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
        + b"\x00" * 10 + flac_packed.to_bytes(8, "big") + b"\x00" * 16)
    add(505, "audio_meta", "wav_header_probe",
        _wav(16000, [(int(900 * math.sin(i / 3.0)),) for i in range(48)]))
    add(506, "audio_meta", "ogg_truncated_corrupt",
        b"OggS" + b"\x00" * 16)
    add(508, "audio_meta", "ogg_vorbis",
        _ogg_page(b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
                  + struct.pack("<I", 44100) + b"\x00" * 16)
        + _ogg_page(b"\x00" * 64, granule=88200, seq=1, header_type=4))
    add(509, "audio_meta", "ogg_opus",
        _ogg_page(b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 312)
                  + struct.pack("<I", 16000) + b"\x00" * 4)
        + _ogg_page(b"\x00" * 32, granule=48312, seq=1, header_type=4))
    add(510, "audio_meta", "caf_unsupported", b"caff" + b"\x00" * 16)
    add(507, "audio_meta", "flac_truncated_corrupt", b"fLaC\x80")

    # ---- EXIF (ids 6xx) and audio tags (ids 7xx) ---------------------
    from test_mediameta import (
        _flac_with_comments,
        _id3,
        _id3_frame,
        _jpeg_with_app1,
        _tiff,
    )

    exif_tiff = _tiff(
        [(0x0112, 3, 1, 6), (0x010F, 2, 6, b"Nikon\x00"),
         (0x0110, 2, 12, b"D850 camera\x00"),
         (0x0132, 2, 20, b"2021:05:01 10:00:00\x00")],
        order=">",
        exif_entries=[(0xA002, 4, 1, 4032), (0xA003, 3, 1, 3024),
                      (0x9003, 2, 20, b"2020:01:02 03:04:05\x00")],
    )
    add(601, "image_exif", "exif_full_mm", _jpeg_with_app1(exif_tiff))
    add(602, "image_exif", "exif_absent_nulls",
        _encode_jpeg(_rng_image(8, 8, seed=61, grey=True))[0])
    add(603, "image_exif", "exif_truncated_corrupt",
        _jpeg_with_app1(_tiff([(0x0112, 3, 1, 1)])[:12]))
    add(604, "image_exif", "exif_png_without_chunk_nulls",
        _png([[(1, 1, 1)]]))
    from test_mediameta import _png_with_exif

    small_tiff = _tiff([(0x0112, 3, 1, 3)], order="<",
                       exif_entries=[(0xA002, 3, 1, 640),
                                     (0xA003, 3, 1, 480)])
    add(605, "image_exif", "exif_png_exif_chunk",
        _png_with_exif(small_tiff))
    vp8_hdr = b"\x00" * 6 + struct.pack("<HH", 32 | 0x4000, 16) \
        + b"\x00" * 8
    webp_body = (b"WEBP" + b"VP8 " + struct.pack("<I", len(vp8_hdr))
                 + vp8_hdr + b"EXIF"
                 + struct.pack("<I", len(small_tiff) + 6)
                 + b"Exif\x00\x00" + small_tiff)
    add(606, "image_exif", "exif_webp_chunk",
        b"RIFF" + struct.pack("<I", len(webp_body)) + webp_body)
    add(607, "image_exif", "exif_gif_unsupported",
        _gif([[0, 1]] * 2, PAL4))
    from test_mediameta import _gps_dms

    gps_tiff = _tiff(
        [(0x0112, 3, 1, 1), (0x010F, 2, 6, b"Pixel\x00")],
        gps_entries=[(1, 2, 2, b"S\x00"),
                     (2, 5, 3, _gps_dms(37, 48, 30.25)),
                     (3, 2, 2, b"E\x00"),
                     (4, 5, 3, _gps_dms(144, 57, 47.5))])
    add(608, "image_exif", "exif_gps_southeast",
        _jpeg_with_app1(gps_tiff))

    add(701, "audio_tags", "id3v4_tags",
        _id3(_id3_frame(b"TIT2", "Sunny Day", encoding=3)
             + _id3_frame(b"TPE1", "Ana", encoding=0)
             + _id3_frame(b"TALB", "Früh", encoding=1)))
    add(702, "audio_tags", "flac_vorbis_comment",
        _flac_with_comments(["TITLE=Nocturne", "artist=Clara",
                             "GENRE=piano"]))
    add(703, "audio_tags", "wav_list_info",
        _wav(8000, [(0,)] * 4,
             pre_data_chunk=(b"LIST", b"INFO" + b"INAM"
                             + struct.pack("<I", 5) + b"Intro" + b"\x00"
                             + b"IART" + struct.pack("<I", 4)
                             + b"Mo\x00\x00")))
    add(704, "audio_tags", "tags_unknown_unsupported",
        b"OggS" + b"\x00" * 8)
    from test_mediameta import _id3v22

    def _frame22(fid, text, encoding=0):
        body = bytes([encoding]) + text.encode(
            "latin-1" if encoding == 0 else "utf-16")
        return fid + len(body).to_bytes(3, "big") + body

    add(706, "audio_tags", "id3v22_tags",
        _id3v22(_frame22(b"TT2", "Vintage") + _frame22(b"TP1", "Duo")
                + _frame22(b"TAL", "Sélection", encoding=1)))
    add(705, "audio_tags", "id3_truncated_corrupt",
        _id3(_id3_frame(b"TIT2", "Cut Short", encoding=3),
             padding=0)[:-2])

    # ---- video_frame: video_keyframe_features (ids 8xx) --------------
    from test_mediameta import _mjpeg_avi

    avi_payload, _ = _mjpeg_avi(_rng_image(16, 16, 31, grey=True))
    add(801, "video_frame", "avi_mjpeg_keyframe", avi_payload)
    rec_payload, _ = _mjpeg_avi(_rng_image(8, 16, 33), rec_group=True,
                                extra_first=True)
    add(802, "video_frame", "avi_mjpeg_rec_grouped", rec_payload)
    add(803, "video_frame", "gif_first_frame",
        _animated_gif([[[0, 1, 2]] * 2, [[1, 2, 3]] * 2], PAL4,
                      delays_cs=[10, 20]))
    add(804, "video_frame", "avi_xvid_unsupported", _avi())
    add(805, "video_frame", "keyframe_corrupt", b"not a container")

    # ---- audio_subband: Layer I essence (ids 9xx) --------------------
    from test_mpegaudio import _ALLOC_MIX, _frame_l1, _sine_groups

    g = _sine_groups(12, 1, _ALLOC_MIX, seed=91)
    f1, _ = _frame_l1(g, alloc_bands=_ALLOC_MIX, protected=True)
    add(901, "audio_subband", "layer1_mono_crc", f1)
    g2 = _sine_groups(24, 2, _ALLOC_MIX, seed=92)
    fa, _ = _frame_l1(g2[:12], alloc_bands=_ALLOC_MIX)
    fb, _ = _frame_l1(g2[12:], alloc_bands=_ALLOC_MIX, padding=1)
    add(902, "audio_subband", "layer1_stereo_two_frames", fa + fb)
    gi = np.zeros((12, 2, 32))
    gi[:, 0, 8] = 0.4 * np.sin(np.arange(12) / 2.0)
    gi[:, 1, 8] = gi[:, 0, 8]
    alloc_i = [0] * 32
    alloc_i[8] = 7
    fi, _ = _frame_l1(gi, alloc_bands=alloc_i, mode=1, mode_ext=0,
                      sf_override={(0, 8): 4, (1, 8): 10})
    add(903, "audio_subband", "layer1_intensity_joint", fi)
    add(904, "audio_subband", "layer3_unsupported",
        b"\xff\xfb\x90\x00" + b"\x00" * 96)
    add(905, "audio_subband", "subband_corrupt", b"\xff\x00junk")
    # Layer II (r12): allocation tables 3-B.2a-d + grouped quantizers
    from test_mpegaudio import _L2_ALLOC_A, _frame_l2, _l2_sine

    from youtube_api_data_etl_automation_spark.operators.mpegaudio import (
        _l2_table,
    )

    gl2 = _l2_sine(36, 1, _L2_ALLOC_A, _l2_table(192, 1, 48000),
                   seed=96)
    fl2, _ = _frame_l2(gl2, rate=48000, bitrate=192,
                       alloc_idx=_L2_ALLOC_A, protected=True)
    add(906, "audio_subband", "layer2_mono_table_a_crc", fl2)
    alloc_b = _L2_ALLOC_A + [1, 2, 0]
    gl2b = _l2_sine(72, 2, alloc_b, _l2_table(384, 2, 44100), seed=97)
    f2a, _ = _frame_l2(gl2b[:36], rate=44100, bitrate=384,
                       alloc_idx=alloc_b)
    f2b, _ = _frame_l2(gl2b[36:], rate=44100, bitrate=384,
                       alloc_idx=alloc_b, padding=1, scfsi_all=2)
    add(907, "audio_subband", "layer2_stereo_table_b_two_frames",
        f2a + f2b)
    low_alloc = [3] * 12 + [0] * 20
    gl2c = _l2_sine(36, 1, low_alloc, _l2_table(48, 1, 32000), seed=98)
    fl2c, _ = _frame_l2(gl2c, rate=32000, bitrate=48,
                        alloc_idx=low_alloc, scfsi_all=2)
    add(908, "audio_subband", "layer2_low_rate_table_d", fl2c)
    # MPEG-2 LSF (r13): Annex B table at 22.05 kHz incl. the 2-bit
    # rows' grouped quantizers, and an LSF Layer I frame
    from youtube_api_data_etl_automation_spark.operators.mpegaudio import (
        _ROWS_LSF,
    )

    lsf_alloc = ([14, 10, 7, 4] + [7, 5, 4, 3, 2, 1, 6]
                 + ([1, 2, 3] * 7)[:19])
    gl2d = _l2_sine(36, 1, lsf_alloc, _ROWS_LSF, seed=99)
    fl2d, _ = _frame_l2(gl2d, rate=22050, bitrate=160,
                        alloc_idx=lsf_alloc, version=2, protected=True)
    add(909, "audio_subband", "layer2_lsf_22050_annex_b", fl2d)
    gl1l = _sine_groups(12, 1, _ALLOC_MIX, seed=100)
    fl1l, _ = _frame_l1(gl1l, rate=24000, bitrate=160,
                        alloc_bands=_ALLOC_MIX, version=2)
    add(910, "audio_subband", "layer1_lsf_24000", fl1l)

    # ---- archive + warc (ids 10xx/11xx) ------------------------------
    import gzip as _gzip

    from test_archives import _tar, _warc, _zip

    named = __import__("io").BytesIO()
    with _gzip.GzipFile(filename="doc.txt", fileobj=named, mode="wb",
                        mtime=7) as _gf:
        _gf.write(b"archived document body " * 4)
    add(1001, "archive", "gzip_named_member", named.getvalue())
    add(1002, "archive", "zip_two_members", _zip())
    add(1003, "archive", "tar_ustar", _tar())
    warc_plain, _ = _warc()
    warc_gz, _ = _warc(per_record_gzip=True)
    add(1004, "archive", "warc_plain_probe", warc_plain)
    add(1005, "archive", "unknown_refusal", b"RAR!unknown")
    # late r14: the stdlib-decodable compressors beyond gzip
    import bz2 as _bz2
    import lzma as _lzma
    add(1006, "archive", "bzip2_probe",
        _bz2.compress(b"bzip2 body bytes here"))
    add(1007, "archive", "xz_probe",
        _lzma.compress(b"xz body bytes here",
                       format=_lzma.FORMAT_XZ))
    add(1101, "warc_records", "warc_plain", warc_plain)
    add(1102, "warc_records", "warc_gzip_per_record", warc_gz)
    add(1103, "warc_records", "warc_truncated", warc_plain[:-60])

    # ---- document: pdf_text / pdf_meta (ids 12xx/13xx) ----------------
    import zlib as _zlib

    from test_pdf import a85, lzw, mkpdf, one_page, stream_obj

    add(1201, "document", "pdf_minimal_escapes",
        one_page(b"BT /F1 12 Tf (Hello, corpus!) Tj 0 -14 Td "
                 b"(esc \\050ok\\051 \\110i) Tj ET"))
    c1 = _zlib.compress(b"BT /F1 9 Tf (page one body) Tj ET")
    c2 = _zlib.compress(b"BT /F1 9 Tf [(ker) -50 (ned) -260 (words)] TJ ET")
    pdf_two_pages = mkpdf([
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 /Resources "
            b"<< /Font << /F1 7 0 R >> >> >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        (4, stream_obj(b"/Filter /FlateDecode ", c1)),
        (5, b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>"),
        (6, stream_obj(b"/Filter /FlateDecode ", c2)),
        (7, b"<< /Type /Font /Subtype /Type1 >>"),
    ])
    add(1202, "document", "pdf_flate_two_pages", pdf_two_pages)
    cmap = (b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"2 beginbfchar <0041> <0394> <0042> <00E9> endbfchar\n"
            b"1 beginbfrange <0050> <0053> <0077> endbfrange")
    add(1203, "document", "pdf_type0_tounicode", mkpdf([
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
        (4, stream_obj(b"", b"BT /F1 10 Tf <00410042> Tj "
                            b"<0050005100520053> Tj ET")),
        (5, b"<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>"),
        (6, stream_obj(b"", cmap)),
    ]))
    objstm_member = (b"<< /Type /Page /Parent 2 0 R /Resources << >> "
                     b"/Contents 4 0 R >>")
    objstm_header = b"3 0 "
    add(1204, "document", "pdf_objstm_lzw_content", mkpdf([
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (4, stream_obj(b"/Filter /LZWDecode ",
                       lzw(b"BT (objstm and lzw decode) Tj ET"))),
        (5, stream_obj(b"/Type /ObjStm /N 1 /First %d /Filter "
                       b"/FlateDecode " % len(objstm_header),
                       _zlib.compress(objstm_header + objstm_member))),
    ]))
    chained = b"BT (ascii85 flate chain) Tj ET "\
        b"BI /W 2 /H 2 /BPC 8 ID \x01\x02\x03\x04 EI BT ( tail) Tj ET"
    add(1205, "document", "pdf_a85_flate_inline_image",
        one_page(chained, filt=b"/Filter [/ASCII85Decode /FlateDecode] ",
                 encode=lambda c: a85(_zlib.compress(c))))
    enc = one_page(b"BT (secret) Tj ET").replace(
        b"/Root 1 0 R ", b"/Root 1 0 R /Encrypt 9 0 R ")
    add(1206, "document", "pdf_encrypted_unsupported", enc)
    add(1207, "document", "pdf_truncated_corrupt",
        one_page(b"BT (cut) Tj ET")[:60])
    add(1208, "document", "pdf_dct_content_unsupported",
        one_page(b"\xff\xd8 not text", filt=b"/Filter /DCTDecode "))

    add(1301, "document_meta", "pdf_probe_two_pages", pdf_two_pages)
    add(1302, "document_meta", "pdf_probe_encrypted", enc)
    add(1303, "document_meta", "pdf_probe_corrupt", b"%PDF-1.4\nempty")
    add(1304, "document_meta", "pdf_probe_info_dict", mkpdf([
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Resources << >> "
            b"/Contents 4 0 R >>"),
        (4, stream_obj(b"", b"BT (x) Tj ET")),
        (9, b"<< /Title <FEFF00C900740075006400650073> "
            b"/Author (Me\\351) /Producer (CorpusWriter 2.1) >>"),
    ], trailer_extra=b"/Info 9 0 R "))

    # ---- image_hash: perceptual hashes (ids 14xx) ---------------------
    # non-monotone in x so the dHash neighbor comparisons carry signal
    hash_px = [[((x * x * 7 + y * 13) % 256, (x * 29 + y * y) % 256,
                 (x * y * 3 + 40) % 256)
                for x in range(20)] for y in range(14)]
    add(1401, "image_hash", "phash_png", _png(hash_px))
    add(1402, "image_hash", "phash_bmp_same_pixels", _bmp24(hash_px))
    add(1403, "image_hash", "phash_jpeg",
        _encode_jpeg(_rng_image(24, 24, seed=71))[0])
    add(1404, "image_hash", "phash_gif",
        _gif([[0, 1, 2, 3, 2, 1, 0, 3]] * 6, PAL4))
    add(1405, "image_hash", "phash_truncated_corrupt", _png(hash_px)[:25])

    # ---- exif_strip: privacy scrub (ids 15xx) -------------------------
    strip_jpeg_base = _encode_jpeg(_rng_image(8, 8, seed=72, grey=True))[0]
    strip_seg = b"Exif\x00\x00" + gps_tiff
    strip_jpeg = (strip_jpeg_base[:2] + b"\xff\xe1"
                  + struct.pack(">H", 2 + len(strip_seg)) + strip_seg
                  + strip_jpeg_base[2:])
    add(1501, "exif_strip", "strip_jpeg_app1", strip_jpeg)
    add(1502, "exif_strip", "strip_png_exif_chunk",
        _png_with_exif(gps_tiff))
    add(1503, "exif_strip", "strip_passthrough_png", _png(hash_px))
    add(1504, "exif_strip", "strip_unknown_unsupported", b"\x00?junk")
    add(1505, "exif_strip", "strip_truncated_jpeg_corrupt",
        strip_jpeg[:30])

    # ---- image_thumb: deterministic resize (ids 17xx) -----------------
    add(1701, "image_thumb", "thumb_png", _png(hash_px))
    add(1702, "image_thumb", "thumb_bmp_same_pixels", _bmp24(hash_px))
    add(1703, "image_thumb", "thumb_jpeg",
        _encode_jpeg(_rng_image(24, 32, seed=73))[0])
    add(1704, "image_thumb", "thumb_corrupt", _png(hash_px)[:22])

    # ---- subtitle: SRT/VTT captions (ids 18xx) ------------------------
    add(1801, "subtitle", "srt_two_cues",
        b"\xef\xbb\xbf1\n00:00:01,000 --> 00:00:03,500\nHello there,\n"
        b"caption one.\n\n2\n00:00:04,000 --> 00:00:06,250\n"
        b"Second cue text.\n")
    add(1802, "subtitle", "vtt_tags_notes_cueids",
        b"WEBVTT - note\n\nNOTE\nskipped\n\nintro\n"
        b"00:01.000 --> 00:03.000\n<v Sp>Styled <i>text</i> here</v>\n\n"
        b"00:00:04.000 --> 01:00:05.500\nPlain second cue\n")
    add(1803, "subtitle", "plain_text_unsupported",
        b"just plain prose, not captions\n")
    add(1804, "subtitle", "backwards_cue_corrupt",
        b"1\n00:00:09,000 --> 00:00:01,000\nbackwards\n")

    # ---- office: docx text (ids 16xx) ---------------------------------
    from test_archives import _docx

    add(1601, "office", "docx_runs_entities_breaks", _docx(
        b"<w:p><w:r><w:t>Quarterly </w:t></w:r>"
        b'<w:r><w:t xml:space="preserve">r&amp;eport &amp;lt;v2&gt;'
        b"</w:t></w:r></w:p>"
        b"<w:p><w:r><w:t>alpha</w:t><w:br/><w:t>beta</w:t>"
        b"<w:tab/><w:t>gamma</w:t></w:r></w:p>"))
    add(1602, "office", "doc_legacy_unsupported",
        b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64)
    add(1603, "office", "zip_without_document_corrupt", _zip())
    # r14 (VERDICT r13 item 4): the presentation and spreadsheet twins
    from test_office import _pptx, _xlsx
    add(1604, "office_pptx", "pptx_two_slides_breaks", _pptx([
        b"<p:sp><a:p><a:r><a:t>Deck &amp; title</a:t></a:r></a:p>"
        b"<a:p><a:r><a:t>one</a:t><a:br/><a:t>two</a:t></a:r></a:p>"
        b"</p:sp>",
        b"<p:sp><a:p><a:r><a:t>closing slide</a:t></a:r></a:p></p:sp>",
    ]))
    add(1605, "office_pptx", "ppt_legacy_unsupported",
        b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64)
    add(1606, "office_xlsx", "xlsx_shared_inline_types", _xlsx(
        [b'<row r="1"><c r="A1" t="s"><v>0</v></c>'
         b'<c r="B1"><v>42</v></c>'
         b'<c r="C1" t="b"><v>0</v></c></row>'
         b'<row r="2"><c r="A2" t="inlineStr"><is><t>inline cell</t>'
         b"</is></c>"
         b'<c r="B2" t="e"><v>#REF!</v></c></row>',
         b'<row r="1"><c r="A1" t="s"><v>1</v></c>'
         b'<c r="B1" t="str"><v>TOTAL=99</v></c></row>'],
        shared=[b"<t>pool </t><t>string</t>", b"<t>k&amp;v</t>"]))
    add(1607, "office_xlsx", "xlsx_zip_without_sheets_corrupt", _zip())
    from test_office import _odf
    add(1608, "office_odf", "odt_paragraphs_tabs_spaces", _odf(
        b'<office:text><text:h text:outline-level="1">Agenda &amp; '
        b"notes</text:h>"
        b"<text:p>x<text:tab/>y<text:line-break/>z"
        b'<text:s text:c="2"/>w</text:p></office:text>'))
    add(1609, "office_odf", "ods_cells", _odf(
        b"<office:spreadsheet><table:table><table:table-row>"
        b"<table:table-cell><text:p>k1</text:p></table:table-cell>"
        b"<table:table-cell><text:p>v1</text:p></table:table-cell>"
        b"</table:table-row></table:table></office:spreadsheet>",
        b"application/vnd.oasis.opendocument.spreadsheet"))
    add(1610, "office_odf", "odf_zip_without_content_corrupt", _zip())
    from test_office import _epub
    add(1611, "document_epub", "epub_two_chapters_entities", _epub([
        b"<h1>Intro</h1><p>Alpha &amp; beta.</p><p>Gamma<br/>delta</p>"
        b"<script>ignore('<p>this</p>')</script>",
        b"<p>Refs: &#72;&#x49;&nbsp;end</p>",
    ]))
    add(1612, "document_epub", "epub_zip_without_container_corrupt",
        _zip())
    from test_mail import _mime_alt
    add(2201, "mail_eml", "eml_mime_alternative_attachment",
        _mime_alt())
    add(2202, "mail_eml", "eml_headerless_corrupt",
        b"just bytes, no rfc5322 headers")
    add(2301, "document_rtf", "rtf_tables_escapes_unicode",
        rb"{\rtf1\ansi{\fonttbl{\f0 Arial;}}"
        rb"\f0 Caf\'e9 notes\par "
        rb"{\*\generator Writer}Euro: \u8364? end\par}")
    add(2302, "document_rtf", "rtf_unbalanced_corrupt",
        rb"{\rtf1 half open")

    # ---- document_images: pdf_images (ids 19xx, r12) ------------------
    from test_pdf_images import img_obj, pdf_with_images, rgb_pixels

    px = rgb_pixels(6, 4, seed=120)
    dct_jpeg = _encode_jpeg(_rng_image(8, 8, seed=121, grey=True))[0]
    add(1901, "document_images", "pdf_flate_rgb_and_dct_jpeg",
        pdf_with_images([
            (b"Raw", img_obj(
                b"/Width 6 /Height 4 /ColorSpace /DeviceRGB "
                b"/BitsPerComponent 8 /Filter /FlateDecode ",
                _zlib.compress(px.tobytes()))),
            (b"Jp", img_obj(
                b"/Width 8 /Height 8 /ColorSpace /DeviceGray "
                b"/BitsPerComponent 8 /Filter /DCTDecode ", dct_jpeg)),
        ]))
    _ipal = bytes([250, 0, 0, 0, 250, 0, 0, 0, 250, 9, 9, 9])
    add(1902, "document_images", "pdf_indexed_palette",
        pdf_with_images(
            [(b"I", img_obj(
                b"/Width 4 /Height 2 /ColorSpace [/Indexed /DeviceRGB "
                b"3 7 0 R] /BitsPerComponent 8 ",
                bytes([0, 1, 2, 3, 3, 2, 1, 0])))],
            extra_objs=[(7, b"<" + _ipal.hex().encode() + b">")]))
    _form = stream_obj(
        b"/Type /XObject /Subtype /Form /Resources "
        b"<< /XObject << /Nested 6 0 R >> >> ", b"")
    add(1903, "document_images", "pdf_form_nested_grey",
        pdf_with_images([
            (b"F", _form),
            (b"Nested", img_obj(
                b"/Width 3 /Height 3 /ColorSpace /DeviceGray "
                b"/BitsPerComponent 8 ", bytes(range(9)))),
        ]))
    add(1904, "document_images", "pdf_jpx_image_refusal",
        pdf_with_images([
            (b"Ok", img_obj(
                b"/Width 2 /Height 2 /ColorSpace /DeviceGray "
                b"/BitsPerComponent 8 ", bytes([5, 6, 7, 8]))),
            (b"Jpx", img_obj(
                b"/Width 2 /Height 2 /Filter /JPXDecode ", b"\x00\x01")),
        ]))
    add(1906, "document_images", "pdf_no_images",
        pdf_with_images([]))
    _cmyk_px = bytes([0, 0, 0, 0, 255, 0, 0, 0, 0, 255, 0, 0,
                      0, 0, 255, 0, 0, 0, 0, 255, 51, 102, 153, 51])
    add(1907, "document_images", "pdf_devicecmyk_rgb",
        pdf_with_images([(b"C", img_obj(
            b"/Width 3 /Height 2 /ColorSpace /DeviceCMYK "
            b"/BitsPerComponent 8 ", _cmyk_px))]))
    from test_ccitt import _encode_g3 as _g3e
    from test_ccitt import _encode_g4 as _g4e
    from test_ccitt import _rand_img as _cri
    import random as _crm
    _pimg = _cri(_crm.Random(77), 9, 24)
    add(1908, "document_images", "pdf_ccitt_g4_and_g3_mixed",
        pdf_with_images([
            (b"Fax", img_obj(
                b"/Width 24 /Height 9 /ColorSpace /DeviceGray "
                b"/BitsPerComponent 1 /Filter /CCITTFaxDecode "
                b"/DecodeParms << /K -1 /Columns 24 >> ",
                _g4e(_pimg))),
            (b"G3", img_obj(  # r13 late: K>0 mixed 1D/2D decodes too
                b"/Width 24 /Height 9 /BitsPerComponent 1 "
                b"/Filter /CCITTFaxDecode "
                b"/DecodeParms << /K 2 /Columns 24 >> ",
                _g3e(_pimg, k=2))),
        ]))
    add(1905, "document_images", "pdf_images_truncated_corrupt",
        pdf_with_images([(b"Raw", img_obj(
            b"/Width 6 /Height 4 /ColorSpace /DeviceRGB "
            b"/BitsPerComponent 8 /Filter /FlateDecode ",
            _zlib.compress(px.tobytes())))])[:70])
    # r14: JBIG2 MMR generic region (decodes via operators/jbig2.py +
    # the T.6 decoder) next to an arithmetic-coded sibling that keeps
    # refusing — golden-pins both the decode and the refusal row
    from test_jbig2 import _page_info as _jb_page
    from test_jbig2 import _region as _jb_region
    from test_jbig2 import _seg as _jb_seg
    _jimg = _cri(_crm.Random(99), 11, 29)
    _jb_body = (_jb_seg(1, 39, 1, _jb_region(_jimg))
                + _jb_seg(2, 49, 1, b""))
    _jb_glob = _jb_seg(0, 48, 1, _jb_page(29, 11))
    add(1909, "document_images", "pdf_jbig2_mmr_and_arith_refusal",
        pdf_with_images([
            (b"Jb", img_obj(
                b"/Width 29 /Height 11 /BitsPerComponent 1 "
                b"/ColorSpace /DeviceGray /Filter /JBIG2Decode "
                b"/DecodeParms << /JBIG2Globals 9 0 R >> ",
                _jb_body)),
            (b"Arith", img_obj(
                b"/Width 6 /Height 4 /BitsPerComponent 1 "
                b"/Filter /JBIG2Decode ",
                _jb_seg(0, 48, 1, _jb_page(6, 4))
                + _jb_seg(1, 39, 1, _jb_region(_jimg[:4, :6],
                                               gflags=0)))),
        ], extra_objs=[(9, stream_obj(b"", _jb_glob))]))

    # ---- image_pages: tiff_page_images (ids 21xx, r14) -----------------
    # VERDICT r13 item 5: the multi-page TIFF surface under the golden
    # oracle — mixed per-page compressions, a corrupt middle page that
    # quarantines alone, and a corrupt container.
    from test_ccitt import _encode_mh as _ccitt_mh_enc
    from test_ccitt import _multi_page_tiff
    _mp0 = _ccitt_rand(_crm.Random(141), 6, 19)
    _mp2 = np.arange(5 * 19, dtype=np.uint8).reshape(5, 19) * 2
    add(2101, "image_pages", "tiff_three_pages_corrupt_middle",
        _multi_page_tiff([
            (_ccitt_g4_enc(_mp0, eofb=False), 4, _mp0.shape, 1, 0),
            (b"\x12\x34\x56", 4, (4, 19), 1, 0),
            (_mp2.tobytes(), 1, _mp2.shape, 8, 1),
        ]))
    _mp3 = _ccitt_rand(_crm.Random(142), 4, 17)
    add(2102, "image_pages", "tiff_two_pages_g4_mh",
        _multi_page_tiff([
            (_ccitt_g4_enc(_mp3, eofb=False), 4, _mp3.shape, 1, 0),
            (_ccitt_mh_enc(_mp3, byte_align=True), 2, _mp3.shape,
             1, 0),
        ]))
    add(2103, "image_pages", "tiff_pages_container_corrupt",
        b"II*\x00junk")

    # ---- document_latex: latex_text (ids 24xx, r14) --------------------
    add(2401, "document_latex", "latex_math_envs_accents",
        b"\\documentclass{article}\n"
        b"\\usepackage{amsmath} % preamble comment\n"
        b"\\begin{document}\n"
        b"\\section{Intro}\n"
        b"Cost is $L=\\sum_i p_i$ and \\$5 (50\\% off) "
        b"--- see~\\cite{x14}.\n"
        b"\\begin{equation}\ny = Wx\n\\end{equation}\n"
        b"Caf\\'e \\textbf{bold} ``quoted''.\n"
        b"\\begin{verbatim}\nif x:\n    go()\n\\end{verbatim}\n"
        b"\\end{document}\n")
    add(2402, "document_latex", "latex_unterminated_math_corrupt",
        b"\\documentclass{a}\\begin{document} x $y "
        b"\\end{document}")
    add(2403, "document_latex", "latex_plain_prose_corrupt",
        b"no tex here at all")

    # ---- document_ipynb: ipynb_text (ids 25xx, r14) --------------------
    import json as _json
    add(2501, "document_ipynb", "ipynb_v4_md_code_raw",
        _json.dumps({
            "nbformat": 4, "nbformat_minor": 5,
            "metadata": {"kernelspec": {"language": "python",
                                        "name": "python3"}},
            "cells": [
                {"cell_type": "markdown",
                 "source": ["# Title\n", "Some *prose*.\n"]},
                {"cell_type": "code", "source": "print('hi')",
                 "outputs": [{"output_type": "stream",
                              "text": ["hi\n"]}]},
                {"cell_type": "raw", "source": "raw tail"},
            ],
        }).encode())
    add(2502, "document_ipynb", "ipynb_v3_worksheets",
        _json.dumps({
            "nbformat": 3, "metadata": {},
            "worksheets": [{"cells": [
                {"cell_type": "heading", "level": 2,
                 "source": "Sec"},
                {"cell_type": "code", "input": "x = 1",
                 "outputs": []},
            ]}],
        }).encode())
    add(2503, "document_ipynb", "ipynb_not_json_corrupt",
        b"{nope")
    add(2504, "document_ipynb", "ipynb_future_nbformat_unsupported",
        b'{"nbformat": 9, "cells": []}')

    # ---- document_markdown: markdown_text (ids 26xx, r14) --------------
    add(2601, "document_markdown", "markdown_readme_constructs",
        b"# Title\n\nSee [docs](https://e.org) and ![logo](i.png) "
        b"with `code` and **bold**.\n\n"
        b"```python\nif x:\n    go()  # **raw**\n```\n\n"
        b"> quoted &amp; <b>tagged</b>\n\n"
        b"- item one\n* item two\n\n"
        b"| a | b |\n|---|---|\n| 1 | 2 |\n")
    add(2602, "document_markdown", "markdown_empty_corrupt", b"")

    return rows


def write_fixture(rows) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from youtube_api_data_etl_automation_spark.plans.codec_check import (
        CODEC_FIXTURE_PATH,
    )

    os.makedirs(os.path.dirname(CODEC_FIXTURE_PATH), exist_ok=True)
    table = pa.table(
        {
            "payload_id": pa.array([r[0] for r in rows], pa.int64()),
            "family": pa.array([r[1] for r in rows], pa.string()),
            "name": pa.array([r[2] for r in rows], pa.string()),
            "payload": pa.array([r[3] for r in rows], pa.binary()),
        }
    )
    pq.write_table(table, CODEC_FIXTURE_PATH)
    return CODEC_FIXTURE_PATH


def write_golden() -> str:
    from youtube_api_data_etl_automation_spark.plans.codec_check import (
        codec_stats,
    )
    from youtube_api_data_etl_automation_spark.session import get_spark

    spark = get_spark("codec-golden")
    rows = sorted(
        (r.doc_id, r.fmt, r.width, r.height, r.fp)
        for r in codec_stats(spark).collect()
    )

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    values = ",\n  ".join(
        f"({d}, {lit(f)}, "
        f"CAST({lit(w)} AS INT), CAST({lit(h)} AS INT), {lit(fp)})"
        for d, f, w, h, fp in rows
    )
    sql = (
        "SELECT * FROM (VALUES\n  " + values
        + "\n) AS t(doc_id, fmt, width, height, fp)"
    )
    out = os.path.join(
        REPO, "youtube_api_data_etl_automation_spark", "plans",
        "codec_golden.py",
    )
    with open(out, "w") as f:
        f.write(
            '"""GENERATED by tools/make_codec_fixture.py — do not '
            "hand-edit.\n\n"
            "Golden per-payload decode/probe fingerprints of the codec\n"
            "fixture corpus; the DuckDB oracle for the `codec` section of\n"
            "`multimodal_frame_features`.\n"
            '"""\n\n'
            f"CODEC_GOLDEN_SQL = '''\n{sql}\n'''\n"
        )
    return out


def write_sniff_golden() -> str:
    """Emit plans/sniff_golden.py: per-payload magic-probe bytes (first
    32 bytes + the tar probe at offset 257) as hex VARCHAR VALUES — the
    DuckDB side of the `codec_sniff` section re-runs the magic CASE
    over these real fixture bytes, independently of the engine's
    Column-math dispatch (r13, VERDICT r12 item 1)."""
    import pyarrow.parquet as pq

    from youtube_api_data_etl_automation_spark.plans.codec_check import (
        CODEC_FIXTURE_PATH,
    )

    t = pq.read_table(CODEC_FIXTURE_PATH)
    rows = sorted(zip(t.column("payload_id").to_pylist(),
                      t.column("payload").to_pylist()))
    values = ",\n  ".join(
        "({}, '{}', '{}')".format(
            pid, (pl or b"")[:32].hex(), (pl or b"")[257:262].hex())
        for pid, pl in rows
    )
    sql = (
        "SELECT * FROM (VALUES\n  " + values
        + "\n) AS t(doc_id, pre, tarmagic)"
    )
    out = os.path.join(
        REPO, "youtube_api_data_etl_automation_spark", "plans",
        "sniff_golden.py",
    )
    triple = chr(39) * 3
    with open(out, "w") as f:
        f.write(
            chr(34) * 3 + "GENERATED by tools/make_codec_fixture.py -- "
            "do not hand-edit.\n\n"
            "Magic-probe byte slices (hex) of every codec-fixture "
            "payload;\nthe DuckDB oracle for the `codec_sniff` section "
            "of\n`multimodal_frame_features` re-runs the sniff CASE "
            "over them.\n" + chr(34) * 3 + "\n\n"
            "CODEC_SNIFF_SRC_SQL = " + triple + "\n" + sql
            + "\n" + triple + "\n"
        )
    return out


def main() -> None:
    rows = build_payloads()
    fx = write_fixture(rows)
    print(f"wrote {fx} ({len(rows)} payloads, "
          f"{sum(len(r[3]) for r in rows)} bytes)")
    out = write_golden()
    print(f"wrote {out}")
    sn = write_sniff_golden()
    print(f"wrote {sn}")


if __name__ == "__main__":
    main()
