"""JPEG codec, pure stdlib — baseline AND progressive.

Decoder: baseline sequential DCT (ITU T.81 SOF0/1) — marker walk, DQT
(8- and 16-bit), DHT (arbitrary tables, read from the stream), SOS,
byte-unstuffing entropy decode with restart-marker support, any
sampling factors (4:4:4, 4:2:0, 4:2:2, ...), dequantize + zigzag +
IDCT, box chroma upsample, JFIF YCbCr->RGB — plus PROGRESSIVE (SOF2,
T.81 Annex G, r10): spectral selection, DC and AC successive
approximation (first + refinement scans), EOB runs with buffered
correction bits, interleaved and single-component scans, restart
markers; coefficients accumulate across scans and dequantize+IDCT
once at EOI. Arithmetic coding, lossless and 12-bit raise
``ValueError`` so callers quarantine.

Encoder: the round-trip twin — JFIF YCbCr, optional 4:2:0 subsample,
forward DCT, Annex K quant tables scaled by the libjpeg quality curve
(quality=100 -> all-ones tables), canonical single-length Huffman
tables (built programmatically and emitted in DHT, so no hand-copied
Annex K Huffman bytes can silently corrupt the bitstream — any
spec-conforming decoder reads them the same way).
:func:`encode_jpeg_progressive` emits SOF2 streams with a scan script
covering every Annex-G decode shape; the SAME quality produces the
SAME quantized coefficients as the baseline encoder, so
decode(progressive) must equal decode(baseline) BYTE-EXACTLY — the
progressive machinery is pinned without any external codec.

Design notes for verifiability without an external decoder:
- The zigzag order is DERIVED (diagonal walk) and unit-pinned against
  the published constant.
- The IDCT accumulates precomputed (u, v) basis planes over nonzero
  coefficients; tests pin it against the direct DCT-III double sum.
- At quality=100 a uniform-color image is DC-only and round-trips
  EXACTLY; general images are pinned by tolerance + cross-format
  feature agreement, and Pillow-gated tests cross-validate both
  directions where Pillow exists.

Reference parity: the reference has no media decode (payloads stay
opaque through its Mongo->ClickHouse path); this module is part of the
multimodal training-data surface.
"""

from __future__ import annotations

import math
import struct

# Decompression-bomb guard (ADVICE r9): SOF-claimed dimensions are
# checked against the shared knob before any pixel buffer is
# allocated, so a tiny payload claiming 65535x65535 quarantines
# cleanly instead of OOM-killing an executor. MAX_PIXELS is only the
# FALLBACK default — decode follows multimodal.MAX_IMAGE_PIXELS (the
# documented mutable limit, same shape as PIL.Image.MAX_IMAGE_PIXELS)
# at call time, so operators that raise the one knob govern every
# decoder, this codec included (ADVICE r10).
MAX_PIXELS = 64_000_000


def _max_pixels() -> int:
    try:
        from cdc_data_pipeline_spark.operators import multimodal

        return int(multimodal.MAX_IMAGE_PIXELS)
    except Exception:
        return MAX_PIXELS


def _build_zigzag():
    """Zigzag scan order via the diagonal walk (T.81 fig. 5): entry k
    is the row-major block index of the k-th zigzag position."""
    order = []
    x = y = 0
    for _ in range(64):
        order.append(y * 8 + x)
        if (x + y) % 2 == 0:                 # moving up-right
            if x == 7:
                y += 1
            elif y == 0:
                x += 1
            else:
                x += 1
                y -= 1
        else:                                # moving down-left
            if y == 7:
                x += 1
            elif x == 0:
                y += 1
            else:
                x -= 1
                y += 1
    return tuple(order)


ZIGZAG = _build_zigzag()

# Annex K base quantization tables (T.81 tables K.1 / K.2), row-major.
QUANT_LUMA = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
)
QUANT_CHROMA = (
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
)


def _scaled_quant(base, quality: int):
    """libjpeg quality curve: 1..100 -> table scaling; 100 gives the
    all-ones table (DC-only content then round-trips exactly)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return tuple(min(255, max(1, (v * scale + 50) // 100)) for v in base)


def _basis():
    """64 precomputed (u, v) IDCT basis planes of 64 doubles each,
    including the 1/4 C(u) C(v) normalization — so
    pixel = sum over coefficients of coeff * plane."""
    planes = []
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for v in range(8):
            cv = math.sqrt(0.5) if v == 0 else 1.0
            plane = []
            for y in range(8):
                for x in range(8):
                    plane.append(
                        0.25 * cu * cv
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                        * math.cos((2 * x + 1) * v * math.pi / 16))
            planes.append(tuple(plane))
    return tuple(planes)


_BASIS = _basis()


def _idct_block(coeffs):
    """Inverse 8x8 DCT of row-major coefficients (already
    dequantized): accumulate basis planes over nonzero coefficients
    (entropy coding leaves most of them zero)."""
    out = [0.0] * 64
    for k in range(64):
        c = coeffs[k]
        if c:
            plane = _BASIS[k]
            for i in range(64):
                out[i] += c * plane[i]
    return out


def _fdct_block(pixels):
    """Forward 8x8 DCT of row-major level-shifted samples. Uses the
    same basis planes (the transform is orthonormal, so forward =
    projection onto each plane with the identical normalization)."""
    return [sum(p * b for p, b in zip(pixels, _BASIS[k]))
            for k in range(64)]


# ---------------------------------------------------------------------------
# Huffman


class _HuffDecoder:
    """Canonical Huffman decode table from a DHT (BITS, VALUES) pair:
    maps (length, code) -> symbol, walked bit by bit."""

    def __init__(self, bits, values):
        if len(bits) != 16:
            raise ValueError("DHT BITS must have 16 entries")
        self.lookup = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if k >= len(values):
                    raise ValueError("DHT VALUES shorter than BITS total")
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


def _canonical_single_length(symbols):
    """(BITS, VALUES) giving every symbol the same code length L with
    2**L > len(symbols) — trivially prefix-free, and the all-ones code
    stays unassigned as T.81 requires. Compression is mediocre; the
    encoder optimizes for correctness-by-construction, not ratio."""
    n = len(symbols)
    length = max(2, (n + 1).bit_length())    # 2**length >= n + 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, list(symbols)


class _HuffEncoder:
    def __init__(self, bits, values):
        self.bits, self.values = bits, values
        self.codes = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.codes[values[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:                 # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any real marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2                # stuffed 0xFF data byte
            else:
                raise ValueError("marker inside entropy stream")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return bit

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def align_to_marker(self):
        """Drop partial bits, skip pad bytes, consume the expected
        RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        pos = self.pos
        while pos + 1 < len(d):
            if d[pos] == 0xFF and d[pos + 1] != 0x00:
                if 0xD0 <= d[pos + 1] <= 0xD7:
                    self.pos = pos + 2
                    return
                break
            pos += 1
        raise ValueError("expected JPEG restart marker")


def _skip_to_marker(b: bytes, pos: int) -> int:
    """Advance past entropy pad/stuffed bytes to the next real marker
    (0xFF followed by neither 0x00 nor another pad 0xFF)."""
    while pos + 1 < len(b):
        if b[pos] == 0xFF and b[pos + 1] != 0x00 and b[pos + 1] != 0xFF:
            return pos
        pos += 1
    return pos


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t-bit magnitude ``v`` to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _bitsize(v: int) -> int:
    return abs(v).bit_length()


# ---------------------------------------------------------------------------
# Decoder


def decode_jpeg(b: bytes):
    """Decode a baseline (SOF0/1) or PROGRESSIVE (SOF2) JPEG to
    (width, height, flat top-down RGB bytes). Grayscale streams
    replicate Y into RGB. Progressive streams (T.81 Annex G: spectral
    selection + successive approximation, DC and AC first/refinement
    scans, EOB runs, restart markers) accumulate coefficients across
    scans and dequantize+IDCT once at EOI — r10, closing the last
    image-format quarantine that was not genuinely dependency-bound.
    Raises ``ValueError`` on arithmetic/lossless/12-bit streams and
    any corruption; callers quarantine."""
    if b[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant = {}
    huff_dc, huff_ac = {}, {}
    comps = None
    w = h = None
    restart_interval = 0
    progressive = False
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:                   # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                         # standalone markers
        (seg_len,) = struct.unpack_from(">H", b, pos)
        seg = b[pos + 2:pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        body_start = pos + seg_len
        if marker == 0xDB:                   # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                sp += 1
                if pq == 0:
                    vals = list(seg[sp:sp + 64])
                    sp += 64
                elif pq == 1:
                    vals = [struct.unpack_from(">H", seg, sp + 2 * i)[0]
                            for i in range(64)]
                    sp += 128
                else:
                    raise ValueError("bad DQT precision")
                if len(vals) < 64:
                    raise ValueError("truncated DQT")
                table = [0] * 64
                for k in range(64):
                    table[ZIGZAG[k]] = vals[k]
                quant[tq] = table
        elif marker == 0xC4:                 # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1:sp + 17])
                n = sum(bits)
                values = list(seg[sp + 17:sp + 17 + n])
                if len(bits) != 16 or len(values) != n:
                    raise ValueError("truncated DHT")
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _HuffDecoder(bits, values)
                sp += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):   # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if fw <= 0 or fh <= 0:
                raise ValueError("invalid JPEG dimensions")
            limit = _max_pixels()
            if fw * fh > limit:
                raise ValueError(
                    f"JPEG dimensions {fw}x{fh} exceed "
                    f"MAX_IMAGE_PIXELS={limit} — decompression-bomb "
                    "guard")
            w, h = fw, fh
            comps = []
            for i in range(nc):
                cid, samp, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("bad JPEG sampling factors")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding (SOF{marker - 0xC0}); "
                "baseline sequential and progressive are "
                "stdlib-decodable")
        elif marker == 0xDD:                 # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:                 # SOS
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    raise ValueError("SOS references unknown component")
                scan.append((comp, tabs >> 4, tabs & 0x0F))
            if progressive:
                if len(seg) < 1 + 2 * ns + 3:
                    raise ValueError("truncated progressive SOS")
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                body_start = _skip_to_marker(b, _decode_scan_progressive(
                    b, body_start, w, h, comps, scan, ss, se,
                    ahal >> 4, ahal & 0x0F, huff_dc, huff_ac,
                    restart_interval))
            else:
                body_start = _skip_to_marker(b, _decode_scan(
                    b, body_start, w, h, comps, scan, quant,
                    huff_dc, huff_ac, restart_interval))
                if all("plane" in c for c in comps):
                    return _planes_to_rgb(comps, w, h)
        pos = body_start
    if progressive and comps is not None \
            and all("coef" in c for c in comps):
        _finalize_progressive(comps, quant)
        return _planes_to_rgb(comps, w, h)
    if comps is not None and any("plane" in c for c in comps):
        raise ValueError("JPEG ended with undecoded components")
    raise ValueError("JPEG contains no scan")


def _decode_block(reader, comp, qt, dc_tab, ac_tab, pred_box):
    """One entropy-coded 8x8 data unit -> spatial samples. ``pred_box``
    is a one-element list holding the component's DC predictor."""
    coeffs = [0.0] * 64
    t = reader.huff(dc_tab)
    if t > 11:
        raise ValueError("bad JPEG DC category")
    pred_box[0] += _extend(reader.receive(t), t)
    coeffs[0] = pred_box[0] * qt[0]
    k = 1
    while k < 64:
        rs = reader.huff(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:                      # ZRL
                k += 16
                continue
            break                            # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run overflow")
        zz = ZIGZAG[k]
        coeffs[zz] = _extend(reader.receive(s), s) * qt[zz]
        k += 1
    return _idct_block(coeffs)


def _store_block(comp, bx, by, px):
    plane = comp["plane"]
    stride = comp["bw"] * 8
    gx, gy = bx * 8, by * 8
    for yy in range(8):
        row = (gy + yy) * stride + gx
        seg8 = px[yy * 8:(yy + 1) * 8]
        for xx in range(8):
            plane[row + xx] = seg8[xx]


def _decode_scan(b, pos, w, h, comps, scan, quant, huff_dc, huff_ac,
                 restart_interval):
    """Decode one scan (interleaved or single-component) into each
    component's ``plane``; returns the stream position just past the
    scan's entropy-coded data."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for comp, td, ta in scan:
        if comp["tq"] not in quant:
            raise ValueError("JPEG missing quantization table")
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError("JPEG missing Huffman table")
        if "plane" not in comp:
            comp["bw"] = mcux * comp["h"]    # blocks across, interleaved
            comp["bh"] = mcuy * comp["v"]
            comp["plane"] = [0.0] * (comp["bw"] * 8 * comp["bh"] * 8)
    reader = _BitReader(b, pos)
    preds = [[0] for _ in scan]
    mcu_count = 0
    if len(scan) == 1 and len(comps) > 1:
        # non-interleaved: MCU = one data unit; the scan rasters the
        # component's own sample grid (T.81 A.2.2)
        comp, td, ta = scan[0]
        qt = quant[comp["tq"]]
        cw = (w * comp["h"] + hmax - 1) // hmax
        ch = (h * comp["v"] + vmax - 1) // vmax
        for by in range((ch + 7) // 8):
            for bx in range((cw + 7) // 8):
                if restart_interval and mcu_count \
                        and mcu_count % restart_interval == 0:
                    reader.align_to_marker()
                    preds[0][0] = 0
                px = _decode_block(reader, comp, qt, huff_dc[td],
                                   huff_ac[ta], preds[0])
                _store_block(comp, bx, by, px)
                mcu_count += 1
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count \
                        and mcu_count % restart_interval == 0:
                    reader.align_to_marker()
                    preds = [[0] for _ in scan]
                for ci, (comp, td, ta) in enumerate(scan):
                    qt = quant[comp["tq"]]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            px = _decode_block(
                                reader, comp, qt, huff_dc[td],
                                huff_ac[ta], preds[ci])
                            _store_block(comp, mx * comp["h"] + bx,
                                         my * comp["v"] + by, px)
                mcu_count += 1
    return reader.pos


def _ensure_coef(comps, w, h):
    """Allocate per-component progressive coefficient storage (natural
    order ints, one 64-slot row per 8x8 block on the INTERLEAVED grid)
    plus the component's own non-interleaved block counts."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        if "coef" not in c:
            c["bw"] = mcux * c["h"]
            c["bh"] = mcuy * c["v"]
            c["coef"] = [0] * (c["bw"] * c["bh"] * 64)
            cw = (w * c["h"] + hmax - 1) // hmax
            ch = (h * c["v"] + vmax - 1) // vmax
            c["cbw"] = (cw + 7) // 8
            c["cbh"] = (ch + 7) // 8
    return mcux, mcuy


def _decode_scan_progressive(b, pos, w, h, comps, scan, ss, se, ah, al,
                             huff_dc, huff_ac, restart_interval):
    """One progressive scan (T.81 Annex G.2): DC first/refinement
    (optionally interleaved), AC first/refinement with EOB runs
    (single-component by spec). Coefficients accumulate in each
    component's ``coef`` store; dequant+IDCT happen once at EOI."""
    if not (0 <= ss <= se <= 63):
        raise ValueError("bad progressive spectral band")
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if ss > 0 and len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    mcux, mcuy = _ensure_coef(comps, w, h)
    reader = _BitReader(b, pos)
    state = {"eobrun": 0}
    preds = [[0] for _ in scan]
    p1 = 1 << al

    def correct(coef, z, bit):
        if bit and (coef[z] & p1) == 0:
            coef[z] += p1 if coef[z] > 0 else -p1

    def dc_first(comp, ci):
        tab = huff_dc.get(scan[ci][1])
        if tab is None:
            raise ValueError("JPEG missing Huffman table")
        t = reader.huff(tab)
        if t > 11:
            raise ValueError("bad JPEG DC category")
        preds[ci][0] += _extend(reader.receive(t), t)
        return preds[ci][0] << al

    def ac_first(coef, base):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        tab = huff_ac.get(scan[0][2])
        if tab is None:
            raise ValueError("JPEG missing Huffman table")
        k = ss
        while k <= se:
            rs = reader.huff(tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:                  # ZRL
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.receive(r)
                break
            k += r
            if k > se:
                raise ValueError("progressive AC run overflow")
            coef[base + ZIGZAG[k]] = \
                _extend(reader.receive(s), s) << al
            k += 1

    def ac_refine(coef, base):
        tab = huff_ac.get(scan[0][2])
        if tab is None:
            raise ValueError("JPEG missing Huffman table")
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = reader.huff(tab)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r < 15:               # EOBn: this block + r more
                        state["eobrun"] = (1 << r)
                        if r:
                            state["eobrun"] += reader.receive(r)
                        break
                    val = 0                  # ZRL: 16 zero-history slots
                else:
                    if s != 1:
                        raise ValueError(
                            "bad refinement AC magnitude (must be 1)")
                    val = p1 if reader.bit() else -p1
                # advance: corrections for nonzero-history coeffs pass
                # free; zero-history slots consume the run
                while k <= se:
                    z = base + ZIGZAG[k]
                    if coef[z] != 0:
                        correct(coef, z, reader.bit())
                    else:
                        if r == 0:
                            if val != 0:
                                coef[z] = val
                            k += 1
                            break
                        r -= 1
                    k += 1
        if state["eobrun"] > 0:
            while k <= se:                   # trailing corrections
                z = base + ZIGZAG[k]
                if coef[z] != 0:
                    correct(coef, z, reader.bit())
                k += 1
            state["eobrun"] -= 1

    def restart():
        reader.align_to_marker()
        state["eobrun"] = 0
        for p in preds:
            p[0] = 0

    mcu_count = 0
    if ss == 0 and (len(scan) > 1 or len(comps) == 1
                    or len(scan) == len(comps)):
        # DC scan, interleaved MCU order (also covers 1-component)
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count \
                        and mcu_count % restart_interval == 0:
                    restart()
                for ci, (comp, _td, _ta) in enumerate(scan):
                    coef = comp["coef"]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            base = ((my * comp["v"] + by) * comp["bw"]
                                    + mx * comp["h"] + bx) * 64
                            if ah == 0:
                                coef[base] = dc_first(comp, ci)
                            else:
                                if reader.bit():
                                    coef[base] |= p1
                mcu_count += 1
    else:
        # single-component scan over the component's own block grid
        comp = scan[0][0]
        coef = comp["coef"]
        for by in range(comp["cbh"]):
            for bx in range(comp["cbw"]):
                if restart_interval and mcu_count \
                        and mcu_count % restart_interval == 0:
                    restart()
                base = (by * comp["bw"] + bx) * 64
                if ss == 0:
                    if ah == 0:
                        coef[base] = dc_first(comp, 0)
                    else:
                        if reader.bit():
                            coef[base] |= p1
                elif ah == 0:
                    ac_first(coef, base)
                else:
                    ac_refine(coef, base)
                mcu_count += 1
    return reader.pos


def _finalize_progressive(comps, quant):
    """Dequantize + IDCT every accumulated coefficient block into the
    components' sample planes (the one-shot tail of the progressive
    pipeline — every scan before this only touched integers)."""
    for comp in comps:
        qt = quant.get(comp["tq"])
        if qt is None:
            raise ValueError("JPEG missing quantization table")
        coef = comp["coef"]
        comp["plane"] = [0.0] * (comp["bw"] * 8 * comp["bh"] * 8)
        for by in range(comp["bh"]):
            for bx in range(comp["bw"]):
                base = (by * comp["bw"] + bx) * 64
                block = [coef[base + i] * qt[i] for i in range(64)]
                _store_block(comp, bx, by, _idct_block(block))


def _planes_to_rgb(comps, w, h):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out = bytearray(w * h * 3)
    if len(comps) == 1:
        plane = comps[0]["plane"]
        stride = comps[0]["bw"] * 8
        for y in range(h):
            for x in range(w):
                v = plane[y * stride + x] + 128.0
                g = min(255, max(0, int(v + 0.5)))
                i = (y * w + x) * 3
                out[i] = out[i + 1] = out[i + 2] = g
        return w, h, bytes(out)
    if len(comps) != 3:
        raise ValueError(f"unsupported JPEG component count {len(comps)}")
    strides = [c["bw"] * 8 for c in comps]
    planes = [c["plane"] for c in comps]
    for y in range(h):
        for x in range(w):
            vals = []
            for ci, c in enumerate(comps):
                # box upsample: integer divide by the sampling ratio
                sx = x * c["h"] // hmax
                sy = y * c["v"] // vmax
                vals.append(planes[ci][sy * strides[ci] + sx])
            Y, Cb, Cr = vals[0] + 128.0, vals[1], vals[2]
            r = Y + 1.402 * Cr
            g = Y - 0.344136 * Cb - 0.714136 * Cr
            bl = Y + 1.772 * Cb
            i = (y * w + x) * 3
            out[i] = min(255, max(0, int(r + 0.5)))
            out[i + 1] = min(255, max(0, int(g + 0.5)))
            out[i + 2] = min(255, max(0, int(bl + 0.5)))
    return w, h, bytes(out)


# ---------------------------------------------------------------------------
# Encoder


def _rgb_to_ycbcr(rgb: bytes, w: int, h: int):
    Y, Cb, Cr = [], [], []
    for i in range(w * h):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        Y.append(0.299 * r + 0.587 * g + 0.114 * b)
        Cb.append(-0.168736 * r - 0.331264 * g + 0.5 * b)
        Cr.append(0.5 * r - 0.418688 * g - 0.081312 * b)
    return Y, Cb, Cr


def _subsample2(plane, w, h):
    """2x2 box average; odd edges replicate."""
    ow, oh = (w + 1) // 2, (h + 1) // 2
    out = []
    for y in range(oh):
        for x in range(ow):
            acc = n = 0
            for dy in (0, 1):
                for dx in (0, 1):
                    sy, sx = 2 * y + dy, 2 * x + dx
                    if sy < h and sx < w:
                        acc += plane[sy * w + sx]
                        n += 1
            out.append(acc / n)
    return out, ow, oh


def _blocks(plane, w, h):
    """Yield (bx, by, 64 row-major samples), edge-replicated to 8x8."""
    for by in range((h + 7) // 8):
        for bx in range((w + 7) // 8):
            blk = []
            for yy in range(8):
                sy = min(by * 8 + yy, h - 1)
                for xx in range(8):
                    sx = min(bx * 8 + xx, w - 1)
                    blk.append(plane[sy * w + sx])
            yield bx, by, blk


# every (run, size) AC symbol baseline JPEG can emit, plus EOB and ZRL
_AC_SYMBOLS = tuple(sorted(
    {0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)}))
_DC_SYMBOLS = tuple(range(12))


def _encode_block(writer, blk, pred_box, dc_enc, ac_enc):
    """Entropy-encode one quantized 8x8 block (row-major ints)."""
    diff = blk[0] - pred_box[0]
    pred_box[0] = blk[0]
    t = _bitsize(diff)
    code, ln = dc_enc.codes[t]
    writer.write(code, ln)
    if t:
        writer.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    zz = [blk[ZIGZAG[k]] for k in range(64)]
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c0, l0 = ac_enc.codes[0xF0]
            writer.write(c0, l0)
            run -= 16
        s = _bitsize(v)
        c1, l1 = ac_enc.codes[(run << 4) | s]
        writer.write(c1, l1)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        c2, l2 = ac_enc.codes[0x00]
        writer.write(c2, l2)


def encode_jpeg(w: int, h: int, rgb: bytes, quality: int = 90,
                subsample: bool = False, gray: bool = False,
                interleave: bool = True,
                restart_interval: int = 0) -> bytes:
    """Encode flat top-down RGB as a baseline JFIF JPEG. Huffman
    tables are canonical single-length tables emitted in DHT (see
    module docstring). ``subsample=True`` uses 4:2:0 chroma;
    ``gray=True`` emits a single-component stream (RGB converted to
    luma); ``interleave=False`` writes one scan per component (4:4:4
    only); ``restart_interval`` emits DRI + RSTn markers every that
    many MCUs. ``quality=100`` yields all-ones quant tables, making
    uniform blocks lossless."""
    if len(rgb) != w * h * 3:
        raise ValueError("rgb length does not match dimensions")
    if not interleave and subsample:
        raise ValueError("non-interleaved encoding supports 4:4:4 only")
    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    Y, Cb, Cr = _rgb_to_ycbcr(rgb, w, h)
    Y = [v - 128.0 for v in Y]               # level shift luma only
    if gray:
        comps = [(Y, w, h, 1, 1, qy, 0)]
    elif subsample:
        cb, cw, ch2 = _subsample2(Cb, w, h)
        cr, _, _ = _subsample2(Cr, w, h)
        comps = [(Y, w, h, 2, 2, qy, 0), (cb, cw, ch2, 1, 1, qc, 1),
                 (cr, cw, ch2, 1, 1, qc, 1)]
    else:
        comps = [(Y, w, h, 1, 1, qy, 0), (Cb, w, h, 1, 1, qc, 1),
                 (Cr, w, h, 1, 1, qc, 1)]

    dc_enc = _HuffEncoder(*_canonical_single_length(_DC_SYMBOLS))
    ac_enc = _HuffEncoder(*_canonical_single_length(_AC_SYMBOLS))

    out = bytearray(b"\xFF\xD8")             # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"

    def dqt(tid, table):
        body = bytes([tid]) + bytes(table[ZIGZAG[k]] for k in range(64))
        return b"\xFF\xDB" + struct.pack(">H", len(body) + 2) + body

    out += dqt(0, qy)
    if not gray:
        out += dqt(1, qc)
    hmax = max(c[3] for c in comps)
    vmax = max(c[4] for c in comps)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, (_, _, _, hi, vi, _, tq) in enumerate(comps):
        sof += struct.pack(">BBB", i + 1, (hi << 4) | vi, tq)
    out += b"\xFF\xC0" + struct.pack(">H", len(sof) + 2) + sof

    def dht(tc, th, enc):
        body = bytes([(tc << 4) | th]) + bytes(enc.bits) + bytes(enc.values)
        return b"\xFF\xC4" + struct.pack(">H", len(body) + 2) + body

    out += dht(0, 0, dc_enc) + dht(1, 0, ac_enc)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)

    # precompute quantized blocks per component
    qblocks = []
    for plane, pw, ph, hi, vi, qt, _ in comps:
        grid = {}
        for bx, by, blk in _blocks(plane, pw, ph):
            co = _fdct_block(blk)
            grid[(bx, by)] = [int(round(co[i] / qt[i])) for i in range(64)]
        qblocks.append(grid)

    zero64 = [0] * 64
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    def sos_header(comp_ids):
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += struct.pack(">BB", cid, 0)
        sos += b"\x00\x3F\x00"
        return b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos

    if interleave or len(comps) == 1:
        out += sos_header([i + 1 for i in range(len(comps))])
        writer = _BitWriter()
        preds = [[0] for _ in comps]
        mcu_count = 0
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count \
                        and mcu_count % restart_interval == 0:
                    writer.flush()
                    writer.out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    preds = [[0] for _ in comps]
                for ci, (_, _, _, hi, vi, _, _) in enumerate(comps):
                    for by in range(vi):
                        for bx in range(hi):
                            blk = qblocks[ci].get(
                                (mx * hi + bx, my * vi + by), zero64)
                            _encode_block(writer, blk, preds[ci],
                                          dc_enc, ac_enc)
                mcu_count += 1
        writer.flush()
        out += writer.out
    else:
        for ci, (_, pw, ph, _, _, _, _) in enumerate(comps):
            out += sos_header([ci + 1])
            writer = _BitWriter()
            pred = [0]
            mcu_count = 0
            rst = 0
            for by in range((ph + 7) // 8):
                for bx in range((pw + 7) // 8):
                    if restart_interval and mcu_count \
                            and mcu_count % restart_interval == 0:
                        writer.flush()
                        writer.out += bytes([0xFF, 0xD0 + rst])
                        rst = (rst + 1) % 8
                        pred[0] = 0
                    blk = qblocks[ci].get((bx, by), zero64)
                    _encode_block(writer, blk, pred, dc_enc, ac_enc)
                    mcu_count += 1
            writer.flush()
            out += writer.out
    out += b"\xFF\xD9"
    return bytes(out)


# every symbol a progressive AC scan can emit: EOBn (r<<4, r<=14),
# ZRL (0xF0), and (run, size) with size<=10 — 176 symbols, still
# single-length-codeable
_AC_SYMBOLS_PROG = tuple(sorted(
    {(r << 4) | s for r in range(16) for s in range(0, 11)}))


def encode_jpeg_progressive(w: int, h: int, rgb: bytes,
                            quality: int = 90, subsample: bool = False,
                            gray: bool = False,
                            restart_interval: int = 0,
                            al: int = 1) -> bytes:
    """Encode flat top-down RGB as a PROGRESSIVE (SOF2) JFIF JPEG —
    the round-trip twin for :func:`decode_jpeg`'s Annex-G path, so
    progressive decode is pinned without any external codec: the same
    quality yields the same quantized coefficients as
    :func:`encode_jpeg`, so decode(progressive) must equal
    decode(baseline) BYTE-EXACTLY.

    Scan script (exercises every Annex-G decode shape): interleaved
    DC first at Al=``al`` then DC refinements down to 0; per component
    AC first scans over two spectral bands (1-5, 6-63) at Al=``al``
    then an AC refinement over 1-63 per level — spectral selection,
    DC+AC successive approximation, EOB runs and correction-bit
    buffering all appear in the stream. ``al=0`` degenerates to
    spectral-selection-only. ``restart_interval`` emits DRI + RSTn
    in every scan (flushing EOB runs, as T.81 requires)."""
    if len(rgb) != w * h * 3:
        raise ValueError("rgb length does not match dimensions")
    if not 0 <= al <= 3:
        raise ValueError("al out of range")
    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    Y, Cb, Cr = _rgb_to_ycbcr(rgb, w, h)
    Y = [v - 128.0 for v in Y]
    if gray:
        comps = [(Y, w, h, 1, 1, qy, 0)]
    elif subsample:
        cb, cw, ch2 = _subsample2(Cb, w, h)
        cr, _, _ = _subsample2(Cr, w, h)
        comps = [(Y, w, h, 2, 2, qy, 0), (cb, cw, ch2, 1, 1, qc, 1),
                 (cr, cw, ch2, 1, 1, qc, 1)]
    else:
        comps = [(Y, w, h, 1, 1, qy, 0), (Cb, w, h, 1, 1, qc, 1),
                 (Cr, w, h, 1, 1, qc, 1)]

    dc_enc = _HuffEncoder(*_canonical_single_length(_DC_SYMBOLS))
    ac_enc = _HuffEncoder(*_canonical_single_length(_AC_SYMBOLS_PROG))

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"

    def dqt(tid, table):
        body = bytes([tid]) + bytes(table[ZIGZAG[k]] for k in range(64))
        return b"\xFF\xDB" + struct.pack(">H", len(body) + 2) + body

    out += dqt(0, qy)
    if not gray:
        out += dqt(1, qc)
    hmax = max(c[3] for c in comps)
    vmax = max(c[4] for c in comps)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, (_, _, _, hi, vi, _, tq) in enumerate(comps):
        sof += struct.pack(">BBB", i + 1, (hi << 4) | vi, tq)
    out += b"\xFF\xC2" + struct.pack(">H", len(sof) + 2) + sof

    def dht(tc, th, enc):
        body = bytes([(tc << 4) | th]) + bytes(enc.bits) \
            + bytes(enc.values)
        return b"\xFF\xC4" + struct.pack(">H", len(body) + 2) + body

    out += dht(0, 0, dc_enc) + dht(1, 0, ac_enc)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)

    # quantized coefficient blocks, ZIGZAG order per block, on the
    # INTERLEAVED grid (absent blocks are zero)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    zero64 = [0] * 64
    zz_grids = []
    for plane, pw, ph, hi, vi, qt, _ in comps:
        grid = {}
        for bx, by, blk in _blocks(plane, pw, ph):
            co = _fdct_block(blk)
            q = [int(round(co[i] / qt[i])) for i in range(64)]
            grid[(bx, by)] = [q[ZIGZAG[k]] for k in range(64)]
        zz_grids.append(grid)

    def sos(specs, ss, se, ah, a):
        body = bytes([len(specs)])
        for cid, td, ta in specs:
            body += struct.pack(">BB", cid, (td << 4) | ta)
        body += bytes([ss, se, (ah << 4) | a])
        return b"\xFF\xDA" + struct.pack(">H", len(body) + 2) + body

    class _Scan:
        """Per-scan emission state: bit writer + EOB-run buffering
        (the encoder mirror of the decoder's eobrun/corrections)."""

        def __init__(self):
            self.wr = _BitWriter()
            self.eobrun = 0
            self.be = []                     # buffered correction bits
            self.rst = 0
            self.mcu = 0

        def flush_eobrun(self):
            if self.eobrun > 0:
                r = self.eobrun.bit_length() - 1
                code, ln = ac_enc.codes[r << 4]
                self.wr.write(code, ln)
                if r:
                    self.wr.write(self.eobrun - (1 << r), r)
                for bit in self.be:
                    self.wr.write(bit, 1)
                self.be = []
                self.eobrun = 0

        def maybe_restart(self, preds):
            if restart_interval and self.mcu \
                    and self.mcu % restart_interval == 0:
                self.flush_eobrun()
                self.wr.flush()
                self.wr.out += bytes([0xFF, 0xD0 + self.rst])
                self.rst = (self.rst + 1) % 8
                for p in preds:
                    p[0] = 0

        def finish(self):
            self.flush_eobrun()
            self.wr.flush()
            return bytes(self.wr.out)

    def blocks_of(ci, bx, by):
        return zz_grids[ci].get((bx, by), zero64)

    def mcu_blocks(scan_cis):
        """Yield per-MCU lists of (ci, zigzag block) in scan order."""
        for my in range(mcuy):
            for mx in range(mcux):
                units = []
                for ci in scan_cis:
                    _, _, _, hi, vi, _, _ = comps[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            units.append((ci, blocks_of(
                                ci, mx * hi + bx, my * vi + by)))
                yield units

    def comp_blocks(ci):
        _, pw, ph, hi, vi, _, _ = comps[ci]
        cbw = ((w * hi + 8 * hmax - 1) // (8 * hmax)) \
            if len(comps) > 1 else (pw + 7) // 8
        cbh = ((h * vi + 8 * vmax - 1) // (8 * vmax)) \
            if len(comps) > 1 else (ph + 7) // 8
        for by in range(cbh):
            for bx in range(cbw):
                yield blocks_of(ci, bx, by)

    all_ids = [(i + 1, 0, 0) for i in range(len(comps))]

    # --- DC first scan (interleaved), point transform = arithmetic >>
    out += sos(all_ids, 0, 0, 0, al)
    sc = _Scan()
    preds = [[0] for _ in comps]
    for units in mcu_blocks(range(len(comps))):
        sc.maybe_restart(preds)
        for ci, zz in units:
            v = zz[0] >> al
            diff = v - preds[ci][0]
            preds[ci][0] = v
            t = _bitsize(diff)
            code, ln = dc_enc.codes[t]
            sc.wr.write(code, ln)
            if t:
                sc.wr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        sc.mcu += 1
    out += sc.finish()

    # --- DC refinement scans, one per remaining bit level
    for level in range(al - 1, -1, -1):
        out += sos(all_ids, 0, 0, level + 1, level)
        sc = _Scan()
        for units in mcu_blocks(range(len(comps))):
            sc.maybe_restart([])
            for _ci, zz in units:
                sc.wr.write((zz[0] >> level) & 1, 1)
            sc.mcu += 1
        out += sc.finish()

    def pt(v, a):
        """AC point transform: magnitude shift toward zero."""
        return (abs(v) >> a) * (1 if v > 0 else -1)

    # --- AC first scans: two spectral bands per component
    for ci in range(len(comps)):
        for ss, se in ((1, 5), (6, 63)):
            out += sos([(ci + 1, 0, 0)], ss, se, 0, al)
            sc = _Scan()
            for zz in comp_blocks(ci):
                sc.maybe_restart([])
                sc.mcu += 1
                vals = [pt(zz[k], al) for k in range(64)]
                nz = [k for k in range(ss, se + 1) if vals[k]]
                if not nz:
                    sc.eobrun += 1
                    if sc.eobrun == 0x7FFF:
                        sc.flush_eobrun()
                    continue
                sc.flush_eobrun()
                run = 0
                for k in range(ss, nz[-1] + 1):
                    v = vals[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_enc.codes[0xF0]
                        sc.wr.write(code, ln)
                        run -= 16
                    s = _bitsize(v)
                    code, ln = ac_enc.codes[(run << 4) | s]
                    sc.wr.write(code, ln)
                    sc.wr.write(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if nz[-1] < se:
                    sc.eobrun += 1
                    if sc.eobrun == 0x7FFF:
                        sc.flush_eobrun()
            out += sc.finish()

    # --- AC refinement scans (libjpeg jcphuff discipline: position-
    # ordered correction bits buffered across EOB runs)
    for level in range(al - 1, -1, -1):
        ah = level + 1
        for ci in range(len(comps)):
            out += sos([(ci + 1, 0, 0)], 1, 63, ah, level)
            sc = _Scan()
            for zz in comp_blocks(ci):
                sc.maybe_restart([])
                sc.mcu += 1
                absv = [abs(zz[k]) >> level for k in range(64)]
                eob = 0
                for k in range(1, 64):
                    if absv[k] == 1:
                        eob = k
                r = 0
                br = []
                for k in range(1, 64):
                    t = absv[k]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        sc.flush_eobrun()
                        code, ln = ac_enc.codes[0xF0]
                        sc.wr.write(code, ln)
                        r -= 16
                        for bit in br:
                            sc.wr.write(bit, 1)
                        br = []
                    if t > 1:
                        br.append(t & 1)
                        continue
                    sc.flush_eobrun()
                    code, ln = ac_enc.codes[(r << 4) | 1]
                    sc.wr.write(code, ln)
                    sc.wr.write(0 if zz[k] < 0 else 1, 1)
                    for bit in br:
                        sc.wr.write(bit, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    sc.eobrun += 1
                    sc.be.extend(br)
                    if sc.eobrun == 0x7FFF:
                        sc.flush_eobrun()
            out += sc.finish()

    out += b"\xFF\xD9"
    return bytes(out)
