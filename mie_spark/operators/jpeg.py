"""Baseline JPEG codec — stdlib + numpy only, no Pillow.

This closes the last compressed-image honesty gap in
operators/multimodal.py (reference parity target: the multimodal
ingest path a training-data pipeline needs; see multimodal.py's module
docstring for the codec-boundary history). PNG's only compression is
DEFLATE, which Python ships; JPEG's is Huffman + DCT, which is pure
arithmetic — so both are implementable with nothing but the stdlib and
numpy, and both now are.

Scope (deliberate):

- DECODE (:func:`parse_jpeg`): baseline sequential DCT (SOF0),
  extended sequential (SOF1), and PROGRESSIVE (SOF2: spectral
  selection + successive approximation, DC/AC first and refinement
  scans, EOB-run coding per T.81 Annex G); 8-bit precision;
  1-component grayscale and 3-component YCbCr with any integer
  sampling factors (4:4:4, 4:2:2, 4:2:0, 4:1:1, ...); restart
  markers (DRI/RSTn); DHT/DQT redefinition between scans.
  Arithmetic coding (SOF9+), hierarchical/lossless modes, 12-bit
  precision, and 4-component CMYK raise ``ValueError`` naming the
  feature — loud, not wrong.
- ENCODE (:func:`jpeg_from_array`): baseline SOF0, Annex-K
  quantization tables scaled by libjpeg's quality formula, Annex-K
  Huffman tables, 4:4:4 or 4:2:0 subsampling, optional restart
  interval. Grayscale (H, W) and RGB (H, W, 3) uint8 input.

The entropy (Huffman) stage decodes coefficient-by-coefficient in
Python — it is inherently sequential within a scan — but everything
after it (dequantize, de-zigzag, IDCT, upsample, color convert) is
vectorized numpy over ALL blocks at once, so per-image cost is
dominated by the bit loop, not per-pixel Python. In the Spark pipeline
this always runs inside Arrow-batched ``mapInPandas`` (one image per
row, one partition per task), the same contract as every other codec
in operators/multimodal.py.

Correctness evidence (tests/test_jpeg.py): decodes a real-world
baseline 4:2:0 JPEG produced by an independent encoder (CPython's own
``Lib/test/imghdrdata/python.jpg`` fixture, vendored), round-trips its
own encoder output at several qualities/subsamplings within quality-
appropriate tolerance, and cross-checks against Pillow when that is
importable (importorskip-gated, like the other optional-dep tests).
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan: position k in the entropy stream corresponds to raster
# index _ZIGZAG[k] of the 8x8 block (ITU-T T.81 Figure 5).
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal 8-point DCT-II matrix: forward F = M @ f @ M.T, inverse
# f = M.T @ F @ M (M is orthogonal).
def _dct_matrix() -> np.ndarray:
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = np.cos((2 * x + 1) * u * np.pi / 16) / 2
    m[0] /= np.sqrt(2)
    return m


_DCT_M = _dct_matrix()

# Annex K (ITU-T T.81 §K.1) base quantization tables, zigzag order is
# NOT used here — these are raster-order as printed in the spec.
_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K (§K.3.3) typical Huffman tables: (bits[1..16], values).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman (T.81 Annex C): codes of each length are
    consecutive, starting from (prev_first_code + prev_count) << 1.
    Returns {(length, code): symbol}; raises on an overfull table."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        n = bits[length - 1]
        if code + n > 1 << length:
            raise ValueError("invalid JPEG Huffman table (overfull)")
        for _ in range(n):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    if k != len(vals):
        raise ValueError("JPEG Huffman table count mismatch")
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), inverse of :func:`_build_decode_table`."""
    return {sym: (code, length) for (length, code), sym in _build_decode_table(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, handling
    0xFF00 byte stuffing inline. Stops consuming at any real marker
    (0xFF followed by non-zero, non-RST); reads past the end of the
    segment yield 0 bits, matching the lenient padding behavior of
    production decoders (the final byte is padded with 1-bits by
    encoders, and a conforming stream never *semantically* reads past
    it)."""

    __slots__ = ("data", "pos", "acc", "nbits", "_stopped")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self._stopped = False

    def _fill(self) -> None:
        if self._stopped or self.pos >= len(self.data):
            self.acc = (self.acc << 8) & 0xFFFFFFFF
            self.nbits += 8
            return
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 2  # stuffed 0xFF data byte
            else:
                # real marker (RSTn handled out-of-band by restart());
                # stop and pad with zero bits
                self._stopped = True
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code in entropy stream")

    def restart(self) -> None:
        """Byte-align, consume the RSTn marker, resume decoding."""
        self.acc = 0
        self.nbits = 0
        self._stopped = False
        # skip any fill bytes, then the RSTn marker itself
        while self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            m = self.data[self.pos + 1]
            if 0xD0 <= m <= 0xD7:
                self.pos += 2
                return
            if m == 0xFF:
                self.pos += 1
                continue
            break
        raise ValueError("expected JPEG restart marker (RSTn)")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s-bit magnitude v to its signed
    value (v < 2^(s-1) means the coefficient is negative)."""
    if s == 0:
        return 0
    return v - (1 << s) + 1 if v < 1 << (s - 1) else v


def parse_jpeg(raw: bytes):
    """REAL baseline-JPEG decoder, stdlib + numpy only. Returns
    (width, height, image) where image is (H, W, 3) uint8 RGB for
    3-component YCbCr files or (H, W, 1) uint8 for grayscale.

    Supports SOF0/SOF1 (sequential) and SOF2 (progressive), 8-bit
    precision, arbitrary integer chroma sampling factors, restart
    markers. Arithmetic entropy coding, hierarchical/lossless modes,
    12-bit precision, and CMYK raise ``ValueError`` naming the
    unsupported feature."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    qtables: dict[int, np.ndarray] = {}  # id -> 64 zigzag-order values
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    width = height = None
    restart_interval = 0
    progressive = False
    frame_ready = False  # progressive: coef arrays allocated
    pos = 2
    while pos + 2 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = raw[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            if progressive and frame_ready:
                return _reconstruct(comps, qtables, width, height)
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(raw):
            break
        seg_len = struct.unpack(">H", raw[pos + 2 : pos + 4])[0]
        body = raw[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq == 0:
                    qtables[tq] = np.frombuffer(
                        body[i : i + 64], dtype=np.uint8
                    ).astype(np.int64)
                    i += 64
                else:
                    qtables[tq] = np.frombuffer(
                        body[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            precision = body[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision} (only 8-bit)")
            height, width = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError(
                    f"unsupported JPEG component count {ncomp} (grayscale/YCbCr only)"
                )
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            if any(c["h"] < 1 or c["v"] < 1 or c["h"] > 4 or c["v"] > 4 for c in comps):
                raise ValueError("bad JPEG sampling factors")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF{marker - 0xC0}); "
                "only baseline/extended sequential Huffman (SOF0/SOF1)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if width is None:
                raise ValueError("JPEG SOS before SOF")
            if not frame_ready:
                _prep_frame(comps, width, height)
                frame_ready = True
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                match = [cc for cc in comps if cc["id"] == cs]
                if not match:
                    raise ValueError("JPEG scan references an unknown component")
                scan_comps.append((match[0], tdta >> 4, tdta & 15))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if not progressive:
                if ns != len(comps):
                    raise ValueError(
                        "non-interleaved sequential JPEG scans not supported"
                    )
                _decode_sequential_scan(
                    raw, pos + 2 + seg_len, comps, scan_comps, htables,
                    restart_interval,
                )
                return _reconstruct(comps, qtables, width, height)
            pos = _decode_progressive_scan(
                raw, pos + 2 + seg_len, scan_comps, htables,
                restart_interval, ss, se, ah, al,
            )
            continue
        pos += 2 + seg_len
    raise ValueError("truncated JPEG (no SOS)")


def _prep_frame(comps: list[dict], width: int, height: int) -> None:
    """Allocate per-component coefficient planes on the MCU block grid
    and record the geometry both scan kinds need."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcus_x * c["h"]  # blocks per row on the MCU grid
        c["bh"] = mcus_y * c["v"]
        # block counts of the component's OWN pixel plane (what
        # non-interleaved/progressive single-component scans cover)
        px_w = (width * c["h"] + hmax - 1) // hmax
        px_h = (height * c["v"] + vmax - 1) // vmax
        c["nbx"] = (px_w + 7) // 8
        c["nby"] = (px_h + 7) // 8
        c["coefs"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        c["pred"] = 0
    comps[0]["_geom"] = (hmax, vmax, mcus_x, mcus_y)


def _decode_sequential_scan(
    raw: bytes,
    data_pos: int,
    comps: list[dict],
    scan_comps: list[tuple[dict, int, int]],
    htables: dict,
    restart_interval: int,
) -> None:
    """Baseline/extended-sequential interleaved scan: fills every
    component's coefficient plane in one MCU pass."""
    for c, td, ta in scan_comps:
        dc = htables.get((0, td))
        ac = htables.get((1, ta))
        if dc is None or ac is None:
            raise ValueError("JPEG scan references an undefined Huffman table")
        c["dc_tab"], c["ac_tab"] = dc, ac

    _hmax, _vmax, mcus_x, mcus_y = comps[0]["_geom"]
    reader = _BitReader(raw, data_pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                for c in comps:
                    c["pred"] = 0
            for c, _td, _ta in scan_comps:
                for v in range(c["v"]):
                    for h in range(c["h"]):
                        block = c["coefs"][
                            (my * c["v"] + v) * c["bw"] + (mx * c["h"] + h)
                        ]
                        # DC
                        s = reader.decode_huff(c["dc_tab"])
                        c["pred"] += _extend(reader.read_bits(s), s)
                        block[0] = c["pred"]
                        # AC
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(c["ac_tab"])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC coefficient overrun")
                            block[k] = _extend(reader.read_bits(s), s)
                            k += 1
            mcu_count += 1


def _next_marker_pos(raw: bytes, pos: int) -> int:
    """Advance past the entropy-coded data ending at/after ``pos`` to
    the next real marker (skipping stuffed 0xFF00 bytes, fill bytes,
    and any RSTn the scan loop did not consume)."""
    while pos + 1 < len(raw):
        if raw[pos] != 0xFF:
            pos += 1
            continue
        nxt = raw[pos + 1]
        if nxt in (0x00, 0xFF):
            pos += 2 if nxt == 0x00 else 1
            continue
        if 0xD0 <= nxt <= 0xD7:
            pos += 2
            continue
        return pos
    return len(raw)


def _decode_progressive_scan(
    raw: bytes,
    data_pos: int,
    scan_comps: list[tuple[dict, int, int]],
    htables: dict,
    restart_interval: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> int:
    """One progressive scan (T.81 Annex G): either a DC scan (ss==0,
    possibly interleaved over all components) or a single-component AC
    scan over a spectral band [ss, se]; ah==0 is a first pass at
    approximation al, ah>0 a one-bit refinement from ah to al.
    Returns the stream position of the next marker."""
    reader = _BitReader(raw, data_pos)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive JPEG DC scan with se != 0")
        for c, td, _ta in scan_comps:
            if ah == 0:
                tab = htables.get((0, td))
                if tab is None:
                    raise ValueError("JPEG DC scan references an undefined table")
                c["dc_tab"] = tab
            c["pred"] = 0
        _progressive_dc_pass(reader, scan_comps, restart_interval, ah, al)
    else:
        if len(scan_comps) != 1:
            raise ValueError("progressive JPEG AC scans must be single-component")
        c, _td, ta = scan_comps[0]
        tab = htables.get((1, ta))
        if tab is None:
            raise ValueError("JPEG AC scan references an undefined table")
        _progressive_ac_pass(reader, c, tab, restart_interval, ss, se, ah, al)
    return _next_marker_pos(raw, reader.pos)


def _progressive_dc_pass(
    reader: _BitReader,
    scan_comps: list[tuple[dict, int, int]],
    restart_interval: int,
    ah: int,
    al: int,
) -> None:
    comps = [c for c, _td, _ta in scan_comps]
    _hmax, _vmax, mcus_x, mcus_y = _find_geom(comps)
    interleaved = len(comps) > 1
    p1 = 1 << al
    mcu_count = 0
    if interleaved:
        iters = ((my, mx) for my in range(mcus_y) for mx in range(mcus_x))
    else:
        c = comps[0]
        iters = ((by, bx) for by in range(c["nby"]) for bx in range(c["nbx"]))
    for a, b in iters:
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            reader.restart()
            for c in comps:
                c["pred"] = 0
        for c in comps:
            if interleaved:
                blocks = [
                    c["coefs"][(a * c["v"] + v) * c["bw"] + (b * c["h"] + h)]
                    for v in range(c["v"])
                    for h in range(c["h"])
                ]
            else:
                blocks = [c["coefs"][a * c["bw"] + b]]
            for block in blocks:
                if ah == 0:
                    s = reader.decode_huff(c["dc_tab"])
                    c["pred"] += _extend(reader.read_bits(s), s)
                    block[0] = c["pred"] << al
                elif reader.read_bits(1):
                    block[0] |= p1
        mcu_count += 1


def _progressive_ac_pass(
    reader: _BitReader,
    c: dict,
    ac_tab: dict,
    restart_interval: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> None:
    eobrun = 0
    block_count = 0
    for by in range(c["nby"]):
        for bx in range(c["nbx"]):
            if (
                restart_interval
                and block_count
                and block_count % restart_interval == 0
            ):
                reader.restart()
                eobrun = 0
            block = c["coefs"][by * c["bw"] + bx]
            if ah == 0:
                eobrun = _first_ac_block(reader, ac_tab, block, ss, se, al, eobrun)
            else:
                eobrun = _refine_ac_block(reader, ac_tab, block, ss, se, al, eobrun)
            block_count += 1


def _first_ac_block(reader, ac_tab, block, ss, se, al, eobrun):  # noqa: ANN001, ANN202
    """First AC pass over band [ss, se]: plain run/size coding plus
    EOB-run codes (s==0, r<15: skip 2^r + bits(r) whole blocks)."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huff(ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG progressive AC coefficient overrun")
        block[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _refine_ac_block(reader, ac_tab, block, ss, se, al, eobrun):  # noqa: ANN001, ANN202
    """AC refinement pass (T.81 G.1.2.3, the correction-bit walk):
    already-nonzero coefficients absorb one correction bit each as the
    run skips over them; new coefficients appear as ±1<<al."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_huff(ac_tab)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s:
                # refinement scans may only introduce magnitude-1 bits
                newval = p1 if reader.read_bits(1) else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                break
            while k <= se:
                v = block[k]
                if v:
                    if reader.read_bits(1) and not v & p1:
                        block[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                block[k] = newval
            k += 1
    if eobrun:
        while k <= se:
            v = block[k]
            if v and reader.read_bits(1) and not v & p1:
                block[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _find_geom(comps: list[dict]):
    """The frame geometry tuple lives on the first SOF component; DC
    scans may present components in scan order, so search."""
    for c in comps:
        if "_geom" in c:
            return c["_geom"]
    # single-component scan of a non-first component: geometry is
    # still derivable from any component's grid vs own-plane counts
    c = comps[0]
    return (1, 1, c["bw"], c["bh"])


def _reconstruct(
    comps: list[dict],
    qtables: dict[int, np.ndarray],
    width: int,
    height: int,
):
    """Dequantize + de-zigzag + IDCT + upsample + color-convert the
    accumulated coefficient planes — shared by the sequential and
    progressive paths, vectorized over all blocks."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("JPEG component references an undefined quant table")
        deq = c["coefs"].astype(np.float64) * q[np.newaxis, :]  # zigzag order
        raster = np.zeros_like(deq)
        raster[:, _ZIGZAG] = deq  # de-zigzag
        blocks = raster.reshape(-1, 8, 8)
        spatial = _DCT_M.T @ blocks @ _DCT_M  # IDCT, all blocks at once
        spatial = np.clip(np.round(spatial) + 128, 0, 255)
        # assemble the block grid into a plane
        plane = (
            spatial.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to the MCU lattice resolution (integer ratios only,
        # which is all T.81 sampling allows), then crop to the image
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(hmax // c["h"], axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        return width, height, planes[0].astype(np.uint8)[:, :, np.newaxis]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    rgb = np.stack([r, g, b], axis=-1)
    return width, height, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int) -> None:
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per T.81


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality->scaling mapping (jcparam.c semantics, a
    published formula): q<50 scales up as 5000/q, q>=50 scales down
    linearly; every entry clamped to [1, 255]."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def _encode_plane_blocks(
    plane: np.ndarray, qt_raster: np.ndarray
) -> np.ndarray:
    """FDCT + quantize every 8x8 block of a (H8, W8) plane; returns
    (n_blocks_y, n_blocks_x, 64) int32 coefficients in ZIGZAG order."""
    h8, w8 = plane.shape
    blocks = (
        plane.reshape(h8 // 8, 8, w8 // 8, 8)
        .transpose(0, 2, 1, 3)
        .astype(np.float64)
        - 128.0
    )
    coefs = _DCT_M @ blocks @ _DCT_M.T
    quant = np.round(coefs / qt_raster.reshape(8, 8)).astype(np.int32)
    flat = quant.reshape(h8 // 8, w8 // 8, 64)
    return flat[:, :, _ZIGZAG]


def _pad_to(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mult_y - h % mult_y) % mult_y
    pw = (mult_x - w % mult_x) % mult_x
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _write_block(
    bw: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
) -> int:
    """Entropy-encode one zigzag-order coefficient block; returns the
    new DC predictor."""
    dc = int(zz[0])
    diff = dc - pred
    mag = abs(diff)
    s = mag.bit_length()
    code, length = dc_tab[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_tab[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = ac_tab[0x00]  # EOB
        bw.write(code, length)
    return dc


def jpeg_from_array(
    img,  # noqa: ANN001
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encoder (SOF0, Annex-K quant + Huffman tables,
    JFIF APP0), stdlib + numpy only — the round-trip partner of
    :func:`parse_jpeg`. Accepts (H, W) or (H, W, 1) grayscale and
    (H, W, 3) RGB uint8; ``subsampling`` is '444' or '420' (ignored
    for grayscale); ``restart_interval`` > 0 emits DRI + RSTn every
    that many MCUs (exercises the decoder's restart path and is what a
    parallel-decode-friendly encoder would do)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    if img.ndim not in (2, 3) or (img.ndim == 3 and img.shape[2] != 3):
        raise ValueError("jpeg_from_array wants (H,W)[,1] gray or (H,W,3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot encode an empty image")
    gray = img.ndim == 2

    qt_luma_r = _quality_scale(_QT_LUMA, quality)
    qt_chroma_r = _quality_scale(_QT_CHROMA, quality)
    # DQT payloads are zigzag order: zz[k] = raster[_ZIGZAG[k]]
    qt_luma_zz = qt_luma_r[_ZIGZAG]
    qt_chroma_zz = qt_chroma_r[_ZIGZAG]

    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0}]
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            # 2x2 mean-pool the chroma planes (pad odd dims first)
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
            comps = [
                {"id": 1, "h": 2, "v": 2, "tq": 0},
                {"id": 2, "h": 1, "v": 1, "tq": 1},
                {"id": 3, "h": 1, "v": 1, "tq": 1},
            ]
        else:
            comps = [
                {"id": 1, "h": 1, "v": 1, "tq": 0},
                {"id": 2, "h": 1, "v": 1, "tq": 1},
                {"id": 3, "h": 1, "v": 1, "tq": 1},
            ]
        planes = [y, cb, cr]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    for c, plane in zip(comps, planes):
        # pad each plane so its block grid exactly tiles the MCU grid
        target_h, target_w = mcus_y * c["v"] * 8, mcus_x * c["h"] * 8
        plane = _pad_to(plane, 8, 8)
        ph, pw = plane.shape
        if ph < target_h or pw < target_w:
            plane = np.pad(
                plane, ((0, target_h - ph), (0, target_w - pw)), mode="edge"
            )
        qt = qt_luma_r if c["tq"] == 0 else qt_chroma_r
        c["zz"] = _encode_plane_blocks(plane, qt)

    dc_luma = _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_luma = _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_chroma = _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_chroma = _build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    for i, c in enumerate(comps):
        c["dc_tab"] = dc_luma if i == 0 else dc_chroma
        c["ac_tab"] = ac_luma if i == 0 else ac_chroma
        c["pred"] = 0

    bw = _BitWriter()
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)])
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = c["zz"][my * c["v"] + v, mx * c["h"] + hh]
                        c["pred"] = _write_block(
                            bw, zz, c["pred"], c["dc_tab"], c["ac_tab"]
                        )
            mcu_count += 1
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xDB, bytes([0x00]) + bytes(qt_luma_zz.astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qt_chroma_zz.astype(np.uint8)))
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += seg(0xC0, bytes(sof))
    out += seg(0xC4, bytes([0x00] + _DC_LUMA_BITS) + bytes(_DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10] + _AC_LUMA_BITS) + bytes(_AC_LUMA_VALS))
    if not gray:
        out += seg(0xC4, bytes([0x01] + _DC_CHROMA_BITS) + bytes(_DC_CHROMA_VALS))
        out += seg(0xC4, bytes([0x11] + _AC_CHROMA_BITS) + bytes(_AC_CHROMA_VALS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(comps)])
    for i, c in enumerate(comps):
        sos += bytes([c["id"], 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al for baseline
    out += seg(0xDA, bytes(sos))
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
