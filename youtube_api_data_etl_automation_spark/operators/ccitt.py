"""CCITT Group 3/4 (ITU-T T.4/T.6) bilevel fax decoding — the
compression of scanned-document PDFs and TIFFs (r13, VERDICT r12
item 3).

Scanned-document corpora — a large slice of any real PDF crawl — store
their page images as CCITT Group 4 (``CCITTFaxDecode`` in PDF,
compression 4 in TIFF). This module decodes the two encodings that
cover that population:

- **Group 4 / T.6** (:func:`decode_g4`): pure 2D coding — every line
  codes against the reference line above it via vertical (±3), pass,
  and horizontal modes; horizontal mode falls back to the T.4
  modified-Huffman run-length alphabet. No EOLs; an optional EOFB
  (two EOLs) terminates.
- **Modified Huffman / G3 1D** (:func:`decode_mh`): each line is an
  independent alternating white/black run sequence from the same T.4
  alphabet (TIFF compression 2 byte-aligns each row; PDF ``K=0``
  optionally does via ``EncodedByteAlign``).

The run-length and mode code tables are transcribed from the public
ITU-T T.4 (Tables 2/3) and T.6 specifications, and their STRUCTURE is
machine-verified in tests/test_ccitt.py: each color's code space is
prefix-free with Kraft sum 4081/4096 — the deficit being exactly the
reserved EOL region, identical for both colors — and the 2D mode
space sums to 127/128 (the missing 1/128 is the EOL prefix). A
mis-recalled entry would collide or change the deficit. On top of
that, an independent test ENCODER (tests/test_ccitt.py — written
against the spec prose, not this decoder) round-trips randomized
bitmaps through every mode, and golden fixture rows pin decoded pixel
fingerprints (plans/codec_golden.py).

Decoded output is a numpy bilevel array (1 = black); the consumers
(operators/tiff.py compression 2/4, operators/pdf.py CCITTFaxDecode)
map it to their color conventions (TIFF PhotometricInterpretation,
PDF ``BlackIs1``).

Scale shape: decoding runs inside the same Arrow-batched mapInPandas
operators as every other codec, per payload, under the family's pixel
budgets and quarantine contract — no shuffle, no driver data-plane.
Refusals stay honest: the T.4/T.6 uncompressed-extension mode (the
0000001 escape) raises NotImplementedError and quarantines as
'unsupported' (mirror-bug policy: its code table is a separate recall
surface). G3 mixed 1D/2D (TIFF T4Options bit 0, PDF K>0) DECODES via
:func:`decode_g3` — the late-r13 rung: one EOL+tag framing layer over
the same two line decoders.

Reference anchor: the reference ETL (fetch_youtube_data.py) consumes
a JSON API and decodes nothing; this codec rung belongs to the
engine's multimodal north star (SURVEY §7), extending pdf_images
(operators/pdf.py:1564) past its r12 CCITT refusal.
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np

# ---------------------------------------------------------------------------
# ITU-T T.4 modified-Huffman run-length tables (Tables 2 and 3) and the
# shared extended make-up codes; T.6 2D mode codes. Written as bit
# strings for auditability; compiled to (length, value) -> run maps at
# import. Structure machine-verified in tests/test_ccitt.py.
# ---------------------------------------------------------------------------

WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011",
    14: "110100", 15: "110101", 16: "101010", 17: "101011",
    18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011",
    26: "0010011", 27: "0100100", 28: "0011000", 29: "00000010",
    30: "00000011", 31: "00011010", 32: "00011011", 33: "00010010",
    34: "00010011", 35: "00010100", 36: "00010101", 37: "00010110",
    38: "00010111", 39: "00101000", 40: "00101001", 41: "00101010",
    42: "00101011", 43: "00101100", 44: "00101101", 45: "00000100",
    46: "00000101", 47: "00001010", 48: "00001011", 49: "01010010",
    50: "01010011", 51: "01010100", 52: "01010101", 53: "00100100",
    54: "00100101", 55: "01011000", 56: "01011001", 57: "01011010",
    58: "01011011", 59: "01001010", 60: "01001011", 61: "00110010",
    62: "00110011", 63: "00110100",
}

WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100",
    512: "01100101", 576: "01101000", 640: "01100111",
    704: "011001100", 768: "011001101", 832: "011010010",
    896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}

BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
}

BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101",
    1152: "0000001110110", 1216: "0000001110111",
    1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101",
    1536: "0000001011010", 1600: "0000001011011",
    1664: "0000001100100", 1728: "0000001100101",
}

# extended make-up codes (T.4 Table 4) are shared by both colors
EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

EOL = "000000000001"

# T.6 two-dimensional mode codes; EXT (0000001) escapes to the
# uncompressed extension, which this decoder refuses.
_MODE_CODES = {
    "1": "V0", "011": "VR1", "000011": "VR2", "0000011": "VR3",
    "010": "VL1", "000010": "VL2", "0000010": "VL3",
    "001": "H", "0001": "P", "0000001": "EXT",
}

_WHITE = 0
_BLACK = 1


def _compile(*tables: dict[int, str]) -> dict[tuple[int, int], int]:
    out: dict[tuple[int, int], int] = {}
    for t in tables:
        for run, code in t.items():
            key = (len(code), int(code, 2))
            if key in out:
                raise AssertionError(f"duplicate code {code}")
            out[key] = run
    return out


_RUN_TABLE = {
    _WHITE: _compile(WHITE_TERM, WHITE_MAKEUP, EXT_MAKEUP),
    _BLACK: _compile(BLACK_TERM, BLACK_MAKEUP, EXT_MAKEUP),
}
_TERM_MAX = 63
_MAX_CODE_LEN = 13  # longest black make-up
_MODE_TABLE = {(len(c), int(c, 2)): m for c, m in _MODE_CODES.items()}
_MODE_MAX_LEN = 7


class _Bits:
    """MSB-first bit reader over a bytes payload."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.n = len(data) * 8

    def exhausted(self) -> bool:
        return self.pos >= self.n

    def _bit(self, p: int) -> int:
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def read_code(self, table: dict[tuple[int, int], int],
                  max_len: int, what: str):
        """Incremental prefix-code lookup: extend one bit at a time
        until the (length, value) pair hits the table."""
        acc = 0
        for ln in range(1, max_len + 1):
            if self.pos >= self.n:
                raise ValueError(
                    f"malformed CCITT: bitstream ends inside a {what} "
                    "code")
            acc = (acc << 1) | self._bit(self.pos)
            self.pos += 1
            hit = table.get((ln, acc))
            if hit is not None:
                return hit
        raise ValueError(
            f"malformed CCITT: no {what} code within {max_len} bits "
            f"(acc={acc:0{max_len}b})")

    def peek_is(self, code: str) -> bool:
        if self.pos + len(code) > self.n:
            return False
        return all(self._bit(self.pos + i) == (c == "1")
                   for i, c in enumerate(code))

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def only_zeros_left(self) -> bool:
        return all(self._bit(p) == 0 for p in range(self.pos, self.n))


def _read_run(bits: _Bits, color: int) -> int:
    """Total run length: zero or more make-up codes then a terminating
    code (T.4 §4.1/§4.2.1.3 — runs past 2560 chain make-ups)."""
    total = 0
    while True:
        run = bits.read_code(_RUN_TABLE[color], _MAX_CODE_LEN,
                             "white run" if color == _WHITE
                             else "black run")
        total += run
        if run <= _TERM_MAX:
            return total
        if total > 1 << 20:
            raise ValueError("malformed CCITT: runaway make-up chain")


def _line_from_transitions(cur: list[int], columns: int) -> np.ndarray:
    row = np.zeros(columns, dtype=np.uint8)
    color = _WHITE
    prev = 0
    for t in cur:
        t = min(t, columns)
        if color == _BLACK:
            row[prev:t] = 1
        prev = t
        color ^= 1
    if color == _BLACK and prev < columns:
        row[prev:columns] = 1
    return row



def _decode_2d_line(bits: _Bits, ref: list[int],
                    columns: int) -> list[int]:
    """One 2D-coded line (T.6 / T.4 2D — identical mode alphabet)
    against the reference line's transition list; returns the coding
    line's transitions."""
    cur: list[int] = []
    a0 = -1
    color = _WHITE
    while a0 < columns:
        mode = bits.read_code(_MODE_TABLE, _MODE_MAX_LEN, "mode")
        if mode == "EXT":
            raise NotImplementedError(
                "CCITT uncompressed extension mode not supported")
        # b1: first changing element on the reference line right of
        # a0 with color opposite to a0's color. Transitions in ref
        # alternate white->black (even index), black->white (odd).
        i = bisect_right(ref, a0)
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else columns
        b2 = ref[i + 1] if i + 1 < len(ref) else columns
        if mode == "P":
            a0 = b2
            continue
        if mode == "H":
            start = a0 if a0 > 0 else 0
            r1 = _read_run(bits, color)
            r2 = _read_run(bits, color ^ 1)
            a1 = start + r1
            a2 = a1 + r2
            if a2 > columns:
                raise ValueError(
                    "malformed CCITT: horizontal runs overrun the "
                    f"line ({a2} > {columns})")
            cur.append(a1)
            cur.append(a2)
            a0 = a2
            continue
        # vertical modes
        delta = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                 "VL1": -1, "VL2": -2, "VL3": -3}[mode]
        a1 = b1 + delta
        if a1 < 0 or a1 > columns:
            raise ValueError(
                f"malformed CCITT: vertical mode lands at {a1}")
        # monotonicity invariant: coding-line changing elements never
        # regress (a1 > a0 except at line start). A VL mode on a
        # malformed stream can land LEFT of a0; appending it would
        # make the next reference line unsorted and the bisect
        # lookups garbage — silent wrong pixels instead of a
        # refusal (r13 review fix)
        if a1 < a0:
            raise ValueError(
                f"malformed CCITT: vertical mode regresses "
                f"({a1} < a0 {a0})")
        cur.append(a1)
        a0 = a1
        color ^= 1
    return cur


def _decode_1d_line(bits: _Bits, columns: int) -> list[int]:
    """One modified-Huffman line: alternating white/black runs summing
    to ``columns``; returns the transition list."""
    cur: list[int] = []
    pos, color = 0, _WHITE
    while pos < columns:
        run = _read_run(bits, color)
        pos += run
        if pos > columns:
            raise ValueError(
                f"malformed CCITT: run overruns the line ({pos} > "
                f"{columns})")
        cur.append(pos)
        color ^= 1
    return cur


def decode_g4(data: bytes, columns: int, rows: int | None = None,
              *, byte_align: bool = False,
              max_rows: int = 1 << 16) -> np.ndarray:
    """Decode a T.6 (Group 4) bitstream to a ``(rows, columns)`` uint8
    array with 1 = black. ``rows=None`` decodes until EOFB, a zero-fill
    tail, or the bitstream exhausts (``max_rows`` bounds a malformed
    stream); with ``rows`` given, exactly that many lines decode and
    trailing EOFB/fill is ignored (the TIFF/PDF convention — both carry
    the row count out of band). ``byte_align`` restarts each coding
    line on a byte boundary (PDF ``EncodedByteAlign`` — r13 review
    fix: it was silently ignored for K<0)."""
    if columns <= 0:
        raise ValueError(f"malformed CCITT: columns={columns}")
    bits = _Bits(data)
    out: list[np.ndarray] = []
    # reference line for the first row: an imaginary all-white line
    ref = [columns, columns]
    while True:
        if rows is not None and len(out) >= rows:
            break
        if rows is None and (len(out) >= max_rows):
            raise ValueError("malformed CCITT: row bound exceeded "
                             "without EOFB")
        if byte_align:
            bits.align()
        if bits.peek_is(EOL + EOL):
            break
        if bits.exhausted():
            if rows is not None:
                raise ValueError(
                    f"malformed CCITT: stream ends after {len(out)} of "
                    f"{rows} rows")
            break
        # zero-padded tail without a full EOFB (encoders pad the last
        # byte; some put fill bits before the EOFB): with no row count
        # expected, an all-zeros remainder is end-of-data, not a mode
        # code — without this check 7+ fill zeros would parse as the
        # EXT escape and misreport 'unsupported' (r13 review fix)
        if rows is None and bits.only_zeros_left():
            break
        cur = _decode_2d_line(bits, ref, columns)
        out.append(_line_from_transitions(cur, columns))
        ref = cur + [columns, columns]
    if rows is not None and len(out) != rows:
        raise ValueError(
            f"malformed CCITT: decoded {len(out)} rows, expected {rows}")
    if not out:
        return np.zeros((0, columns), dtype=np.uint8)
    return np.stack(out)


def decode_mh(data: bytes, columns: int, rows: int | None = None,
              *, byte_align: bool = False, max_rows: int = 1 << 16
              ) -> np.ndarray:
    """Decode a modified-Huffman (G3 one-dimensional, no EOL) stream:
    each line is an independent alternating white/black run sequence
    summing to ``columns`` (a line always STARTS white — a leading
    black pixel is coded via a zero-length white run). ``byte_align``
    restarts each line on a byte boundary (TIFF compression 2 always
    does; PDF ``EncodedByteAlign``). Leading EOLs are tolerated and
    skipped (PDF streams sometimes carry them even with K=0)."""
    if columns <= 0:
        raise ValueError(f"malformed CCITT: columns={columns}")
    bits = _Bits(data)
    out: list[np.ndarray] = []
    while True:
        if rows is not None and len(out) >= rows:
            break
        if rows is None and len(out) >= max_rows:
            raise ValueError("malformed CCITT: row bound exceeded")
        if byte_align:
            bits.align()
        while bits.peek_is(EOL):
            bits.pos += len(EOL)
        # end-of-data: exhausted, an all-zeros pad tail (r13 review
        # fix — byte padding leaves 1-7 zero fill bits and the old
        # '<4 bits' test missed 4-7), or a tail too short to start a
        # line (the shortest white code is 4 bits)
        if bits.exhausted() or bits.n - bits.pos < 4 \
                or (rows is None and bits.only_zeros_left()):
            break
        out.append(_line_from_transitions(
            _decode_1d_line(bits, columns), columns))
    if rows is not None and len(out) != rows:
        raise ValueError(
            f"malformed CCITT: decoded {len(out)} rows, expected {rows}")
    if not out:
        return np.zeros((0, columns), dtype=np.uint8)
    return np.stack(out)


def decode_g3(data: bytes, columns: int, rows: int | None = None,
              *, max_rows: int = 1 << 16) -> np.ndarray:
    """Decode a G3 two-dimensional-capable stream (T.4 §4.2 — TIFF
    compression 3 with T4Options bit 0, PDF ``CCITTFaxDecode`` with
    ``K > 0``): every line is preceded by an EOL plus a one-bit tag
    (1 = the line is 1D/modified-Huffman coded, 0 = 2D coded against
    the line above). The EOL scanner tolerates any number of zero
    FILL bits before each EOL (T4Options bit 2 pads EOLs to byte
    boundaries — handled naturally, no option plumbing needed) and
    treats six consecutive EOLs (RTC) or a fill-only tail as end of
    data. The first line must be 1D by spec; a 2D tag there is
    malformed (there is no reference line). ``rows`` as in
    :func:`decode_g4`."""
    if columns <= 0:
        raise ValueError(f"malformed CCITT: columns={columns}")
    bits = _Bits(data)
    out: list[np.ndarray] = []
    ref = [columns, columns]

    def eat_eol() -> bool:
        """Consume zero fill bits + one EOL; False at end of data."""
        zeros = 0
        while not bits.exhausted():
            if bits._bit(bits.pos) == 0:
                bits.pos += 1
                zeros += 1
                continue
            if zeros < 11:
                raise ValueError(
                    "malformed CCITT: expected EOL before a G3 2D "
                    f"line (only {zeros} zeros before the 1)")
            bits.pos += 1  # the EOL's terminating 1
            return True
        return False  # fill-only tail / exhausted

    while True:
        if rows is not None and len(out) >= rows:
            break
        if rows is None and len(out) >= max_rows:
            raise ValueError("malformed CCITT: row bound exceeded "
                             "without RTC")
        if not eat_eol():
            if rows is not None:
                raise ValueError(
                    f"malformed CCITT: stream ends after {len(out)} "
                    f"of {rows} rows")
            break
        if bits.exhausted() or (
                rows is None and bits.only_zeros_left()):
            break
        tag = bits._bit(bits.pos)
        bits.pos += 1
        # RTC / end-of-page: after the tag bit, 8+ zeros cannot start
        # any legal run or mode code (the longest legal zero prefix is
        # the 7-zero extended make-up 1792) — the only thing that can
        # follow is another EOL, i.e. the standard (EOL+1)x6 RTC
        # libtiff writes OR a tagless EOLx6 (r13 review fix: the old
        # probe matched only the tagless form and misparsed the
        # standard one)
        if bits.exhausted() or bits.peek_is("0" * 8):
            break
        if tag == 1:
            cur = _decode_1d_line(bits, columns)
        else:
            if not out:
                raise ValueError(
                    "malformed CCITT: first G3 line tagged 2D (no "
                    "reference line exists)")
            cur = _decode_2d_line(bits, ref, columns)
        out.append(_line_from_transitions(cur, columns))
        ref = cur + [columns, columns]
    if rows is not None and len(out) != rows:
        raise ValueError(
            f"malformed CCITT: decoded {len(out)} rows, expected "
            f"{rows}")
    if not out:
        return np.zeros((0, columns), dtype=np.uint8)
    return np.stack(out)
