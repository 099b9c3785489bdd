"""Stdlib compressed-image codecs: PNG (zlib inflate + unfilter +
Adam7) and GIF (pure-Python LZW), closing the last decode gate that
previously ran only behind Pillow.

Pinning strategy, strongest first:
1. Cross-format invariance on Spark: the SAME pixels delivered as PPM,
   PNG (every filter type), and GIF (plain + interlaced) must produce
   byte-identical feature rows from ``extract_image_features`` — and
   the PPM path is already pinned cross-engine by the DuckDB oracle
   (``image_features`` / ``image_dup_pairs``), so the new codecs
   inherit that pin transitively.
2. Spec-pinned unit vectors: Paeth predictor examples computed by hand
   from the published algorithm (ITU/W3C PNG spec §9.4), hand-built
   PNGs for each color type / Adam7, hand-built GIFs (incl. the KwKwK
   LZW case) — independent of the encoder, so conjugate
   encoder/decoder bugs cannot cancel.
3. Encoder round-trips across sizes, filters, palettes, dictionary
   growth, and the 4096-entry LZW re-clear.

Reference parity: the reference pipeline has no media decode at all
(its payloads stay opaque through Mongo->ClickHouse,
clickhouse_load_tool/base_loader.py); this surface is part of the
LLM-training-data extension mandate.
"""

import random
import struct
import zlib

import pytest

from cdc_data_pipeline_spark.operators.multimodal import (
    _ADAM7,
    _PNG_SIG,
    _decode_gif,
    _decode_image_stdlib,
    _decode_png,
    _encode_gif,
    _encode_png,
    _gif_lzw_decode,
    _gif_lzw_encode,
    _paeth,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


_PNG_CH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _make_png(w, h, ctype, raw_px, plte=None, interlace=0):
    """Hand-built PNG, independent of ``_encode_png`` (any color type,
    optional Adam7), all rows filter 0."""
    ch = _PNG_CH[ctype]
    lines = bytearray()
    if interlace == 0:
        for r in range(h):
            lines.append(0)
            lines += raw_px[r * w * ch:(r + 1) * w * ch]
    else:
        for x0, y0, xs, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue
            for ry in range(ph):
                lines.append(0)
                for rx in range(pw):
                    src = ((y0 + ry * ys) * w + (x0 + rx * xs)) * ch
                    lines += raw_px[src:src + ch]
    out = _PNG_SIG + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, interlace))
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(bytes(lines)))
    return out + _chunk(b"IEND", b"")


class TestPaeth:
    def test_spec_examples(self):
        # hand-computed from the published predictor: p = a + b - c,
        # pick the of a/b/c nearest p, ties broken a, b, c
        assert _paeth(0, 0, 0) == 0
        # p=75: |75-100|=25, |75-50|=25, |75-75|=0 -> c
        assert _paeth(100, 50, 75) == 75
        # p=30: |30-10|=20, |30-20|=10, |30-0|=30 -> b
        assert _paeth(10, 20, 0) == 20
        # tie pa==pb==pc -> a
        assert _paeth(5, 5, 5) == 5
        # p=12: pa=|12-8|=4, pb=|12-4|=8, pc=|12-0|=12 -> a
        assert _paeth(8, 4, 0) == 8


class TestPngRoundTrip:
    @pytest.mark.parametrize("dims", [(1, 1), (4, 9), (7, 3), (16, 16),
                                      (5, 1), (1, 6)])
    def test_every_filter_type(self, dims):
        w, h = dims
        rng = random.Random(w * 100 + h)
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        for ft in range(5):
            enc = _encode_png(w, h, rgb, row_filter=lambda r, ft=ft: ft)
            assert _decode_png(enc) == (w, h, rgb), f"filter {ft}"
        enc = _encode_png(w, h, rgb, row_filter=lambda r: r % 5)
        assert _decode_png(enc) == (w, h, rgb)

    def test_dispatch_signature(self):
        rgb = bytes(range(48))
        assert _decode_image_stdlib(_encode_png(4, 4, rgb)) == (4, 4, rgb)


class TestPngColorTypes:
    """Hand-built PNGs (not via _encode_png) so decoder bugs cannot be
    masked by a matching encoder bug."""

    def setup_method(self):
        self.rng = random.Random(3)

    def test_grayscale(self):
        w, h = 5, 7
        g = bytes(self.rng.randrange(256) for _ in range(w * h))
        want = b"".join(bytes([v, v, v]) for v in g)
        assert _decode_png(_make_png(w, h, 0, g)) == (w, h, want)

    def test_palette(self):
        w, h = 5, 7
        plte = bytes(self.rng.randrange(256) for _ in range(768))
        idx = bytes(self.rng.randrange(256) for _ in range(w * h))
        want = b"".join(plte[v * 3:v * 3 + 3] for v in idx)
        assert _decode_png(_make_png(w, h, 3, idx, plte=plte)) == (w, h, want)

    def test_gray_alpha_drops_alpha(self):
        w, h = 5, 7
        ga = bytes(self.rng.randrange(256) for _ in range(w * h * 2))
        want = b"".join(bytes([v, v, v]) for v in ga[0::2])
        assert _decode_png(_make_png(w, h, 4, ga)) == (w, h, want)

    def test_rgba_drops_alpha(self):
        w, h = 5, 7
        rgba = bytes(self.rng.randrange(256) for _ in range(w * h * 4))
        want = b"".join(rgba[i * 4:i * 4 + 3] for i in range(w * h))
        assert _decode_png(_make_png(w, h, 6, rgba)) == (w, h, want)

    @pytest.mark.parametrize("dims", [(1, 1), (2, 2), (3, 1), (1, 5),
                                      (5, 7), (8, 8), (9, 10), (16, 17)])
    def test_adam7_interlace(self, dims):
        w, h = dims
        px = bytes(self.rng.randrange(256) for _ in range(w * h * 3))
        assert _decode_png(_make_png(w, h, 2, px, interlace=1)) == (w, h, px)


class TestPngQuarantine:
    def test_corrupt_variants_raise_value_error(self):
        good = _encode_png(4, 4, bytes(48))
        bad_crc = bytearray(good)
        bad_crc[-5] ^= 0xFF
        cases = [
            bytes(bad_crc),              # CRC mismatch
            good[:30],                   # truncated chunk
            b"\x89PNG\r\n\x1a\nXXXX",    # signature only
            b"nope",                     # not a PNG at all
        ]
        for payload in cases:
            with pytest.raises(ValueError):
                _decode_png(payload)

    def test_unsupported_depth_and_interlace_raise(self):
        ihdr16 = _PNG_SIG + _chunk(
            b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        with pytest.raises(ValueError, match="bit depth"):
            _decode_png(ihdr16)
        bad_inter = _PNG_SIG + _chunk(
            b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 9))
        with pytest.raises(ValueError, match="interlace"):
            _decode_png(bad_inter)

    def test_truncated_pixels_raise(self):
        short = _PNG_SIG + _chunk(
            b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        short += _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        short += _chunk(b"IEND", b"")
        with pytest.raises(ValueError):
            _decode_png(short)


_GRAY_PAL = b"".join(bytes([i, i, i]) for i in range(256))


class TestGifLzw:
    def test_kwkwk_hand_vector(self):
        # the classic KwKwK case: 'aaaa' with min_code_size=2.
        # Codes: CLEAR(4), 0 ('a'), 4+2=6 -> not yet in table at decode
        # time -> prev + prev[0] = 'aa', EOI(5).
        encoded = _gif_lzw_encode(b"\x00\x00\x00\x00", 2)
        assert _gif_lzw_decode(encoded, 2, 4) == b"\x00\x00\x00\x00"

    def test_round_trip_dict_growth(self):
        data = bytes((i * i + 3 * i) % 256 for i in range(10_000))
        assert _gif_lzw_decode(_gif_lzw_encode(data, 8), 8,
                               len(data)) == data

    def test_round_trip_reclear_at_4096(self):
        # incompressible noise forces one new dict entry per step ->
        # crosses the 4096 re-clear
        rng = random.Random(17)
        data = bytes(rng.randrange(256) for _ in range(9_000))
        assert _gif_lzw_decode(_gif_lzw_encode(data, 8), 8,
                               len(data)) == data

    def test_truncated_stream_raises(self):
        enc = _gif_lzw_encode(bytes(range(100)), 8)
        with pytest.raises(ValueError):
            _gif_lzw_decode(enc[:3], 8, 100)


class TestGifRoundTrip:
    @pytest.mark.parametrize("dims", [(1, 1), (4, 9), (7, 3), (16, 16),
                                      (13, 5)])
    @pytest.mark.parametrize("interlace", [False, True])
    def test_gray_palette(self, dims, interlace):
        w, h = dims
        rng = random.Random(w * 31 + h)
        idx = bytes(rng.randrange(256) for _ in range(w * h))
        g = _encode_gif(w, h, idx, _GRAY_PAL, interlace=interlace)
        want = b"".join(bytes([v, v, v]) for v in idx)
        assert _decode_gif(g) == (w, h, want)
        assert _decode_image_stdlib(g) == (w, h, want)

    def test_small_palette_small_code_size(self):
        pal4 = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
        idx = bytes([0, 1, 2, 3] * 8)
        g = _encode_gif(8, 4, idx, pal4, min_code_size=2)
        want = b"".join(pal4[v * 3:v * 3 + 3] for v in idx)
        assert _decode_gif(g) == (8, 4, want)

    def test_extension_blocks_skipped(self):
        """A graphic-control extension between the header and the image
        descriptor must be skipped, not decoded."""
        idx = bytes([7, 9, 11, 13])
        g = _encode_gif(2, 2, idx, _GRAY_PAL)
        # splice a GCE right after header + GCT (6 + 7 + 768 bytes)
        cut = 13 + 768
        gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        spliced = g[:cut] + gce + g[cut:]
        want = b"".join(bytes([v, v, v]) for v in idx)
        assert _decode_gif(spliced) == (2, 2, want)

    def test_corrupt_variants_raise(self):
        g = _encode_gif(2, 2, bytes(4), _GRAY_PAL)
        for payload in (b"GIF89a", g[:20], b"nope", g[:6] + g[8:]):
            with pytest.raises(ValueError):
                _decode_gif(payload)


class TestPropertyRoundTrips:
    """Hypothesis sweeps: ANY pixel content at ANY small dimension
    round-trips through every codec — driver-side only (no Spark), so
    examples stay cheap."""

    from hypothesis import given, settings, strategies as st

    _dims = st.tuples(st.integers(1, 24), st.integers(1, 24))

    @settings(max_examples=20, deadline=None)
    @given(dims=_dims, seed=st.integers(0, 2**32 - 1),
           ft=st.integers(0, 5))
    def test_png_any_content_any_filter(self, dims, seed, ft):
        w, h = dims
        rng = random.Random(seed)
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        row_filter = (lambda r: r % 5) if ft == 5 else (lambda r: ft)
        assert _decode_png(_encode_png(w, h, rgb, row_filter=row_filter)) \
            == (w, h, rgb)

    @settings(max_examples=20, deadline=None)
    @given(dims=_dims, seed=st.integers(0, 2**32 - 1),
           interlace=st.booleans())
    def test_gif_any_content(self, dims, seed, interlace):
        w, h = dims
        rng = random.Random(seed)
        idx = bytes(rng.randrange(256) for _ in range(w * h))
        got = _decode_gif(_encode_gif(w, h, idx, _GRAY_PAL,
                                      interlace=interlace))
        assert got == (w, h, b"".join(bytes([v, v, v]) for v in idx))

    @settings(max_examples=10, deadline=None)
    @given(dims=_dims, shade=st.tuples(st.integers(0, 255),
                                       st.integers(0, 255),
                                       st.integers(0, 255)))
    def test_jpeg_uniform_exact_any_dims_any_color(self, dims, shade):
        from cdc_data_pipeline_spark.operators.jpegcodec import (
            decode_jpeg, encode_jpeg)

        w, h = dims
        rgb = bytes(shade) * (w * h)
        assert decode_jpeg(encode_jpeg(w, h, rgb, quality=100)) \
            == (w, h, rgb)

    @settings(max_examples=10, deadline=None)
    @given(dims=_dims, seed=st.integers(0, 2**32 - 1))
    def test_jpeg_gray_q100_within_proved_bound(self, dims, seed):
        """Gray content (r=g=b integers) at quality 100: error is
        bounded by the proved coefficient-rounding bound (< 4) — the
        structural guarantee the jpeg_roundtrip oracle claims."""
        from cdc_data_pipeline_spark.operators.jpegcodec import (
            decode_jpeg, encode_jpeg)

        w, h = dims
        rng = random.Random(seed)
        rgb = b"".join(bytes([v, v, v]) for v in
                       (rng.randrange(256) for _ in range(w * h)))
        got = decode_jpeg(encode_jpeg(w, h, rgb, quality=100))[2]
        assert max(abs(a - b) for a, b in zip(got, rgb)) <= 4


class TestCrossFormatInvariance:
    """The load-bearing pin: identical pixels through every container
    must featurize identically on the Spark seam. The PPM leg is
    oracle-pinned cross-engine (catalog ``image_features`` /
    ``image_dup_pairs``), so PNG and GIF inherit that pin."""

    def _pixels(self, doc_id: int, h: int):
        # the catalog's (c + 37x) % 256 gray formula, c = row seed
        rows = []
        for y in range(h):
            c = (doc_id * 13 + y * 7) % 256
            rows.append([(c + 37 * x) % 256 for x in range(4)])
        return rows

    def _payloads(self, doc_id: int, h: int):
        from cdc_data_pipeline_spark.operators.multimodal import (
            _encode_tiff)

        rows = self._pixels(doc_id, h)
        rgb = b"".join(bytes([v, v, v]) for row in rows for v in row)
        idx = bytes(v for row in rows for v in row)
        return {
            "ppm": b"P6\n4 %d\n255\n" % h + rgb,
            "pgm": b"P5\n4 %d\n255\n" % h + idx,
            "png": _encode_png(4, h, rgb, row_filter=lambda r: r % 5),
            "png_adam7": _make_png(4, h, 2, rgb, interlace=1),
            "gif": _encode_gif(4, h, idx, _GRAY_PAL),
            "gif_interlaced": _encode_gif(4, h, idx, _GRAY_PAL,
                                          interlace=True),
            "tiff": _encode_tiff(4, h, rgb, compression=32773,
                                 rows_per_strip=3),
            "tiff_be": _encode_tiff(4, h, rgb, big_endian=True),
        }

    def test_features_identical_across_formats(self, spark):
        from cdc_data_pipeline_spark.operators.multimodal import (
            extract_image_features)

        rows = []
        for doc_id in range(1, 9):
            h = 16 + doc_id * 3
            for fi, (fmt, payload) in enumerate(
                    sorted(self._payloads(doc_id, h).items())):
                rows.append((doc_id * 10 + fi, fmt, payload))
        media = spark.createDataFrame(
            rows, "media_id long, fmt string, payload binary")
        feats = extract_image_features(media).collect()
        assert all(r.decode_error is None for r in feats)
        by_doc = {}
        for r in feats:
            key = (r.width, r.height, r.n_pixels, r.mean_gray,
                   tuple(r.band_means), r.ahash)
            by_doc.setdefault(r.media_id // 10, set()).add(key)
        # every format of a doc collapses to ONE feature tuple
        assert all(len(v) == 1 for v in by_doc.values()), by_doc
        # and docs differ from each other (the features carry signal)
        assert len({next(iter(v)) for v in by_doc.values()}) == len(by_doc)

    def test_mixed_batch_quarantines_only_bad_rows(self, spark):
        from cdc_data_pipeline_spark.operators.multimodal import (
            extract_image_features)

        payloads = self._payloads(1, 20)
        rows = [(1, payloads["png"]), (2, b"\x89PNG\r\n\x1a\ngarbage"),
                (3, payloads["gif"]), (4, None)]
        media = spark.createDataFrame(rows, "media_id long, payload binary")
        out = {r.media_id: r for r in
               extract_image_features(media).collect()}
        assert out[1].decode_error is None
        assert out[3].decode_error is None
        assert out[2].decode_error is not None
        assert out[4].decode_error is not None

    def test_resize_composes_from_compressed_inputs(self, spark):
        """PNG/GIF payloads flow through resize_images (decode ->
        bilinear -> PPM re-encode) and the output re-featurizes —
        equal across input formats."""
        from cdc_data_pipeline_spark.operators.multimodal import (
            extract_image_features, resize_images)

        payloads = self._payloads(5, 24)
        rows = [(i, p) for i, (_, p) in
                enumerate(sorted(payloads.items()))]
        media = spark.createDataFrame(rows, "media_id long, payload binary")
        small = resize_images(media, 6, 6)
        feats = extract_image_features(
            small.select("media_id", "payload")).collect()
        assert all(r.decode_error is None for r in feats)
        keys = {(r.mean_gray, tuple(r.band_means), r.ahash) for r in feats}
        assert len(keys) == 1


def _tiff_lzw_encode(data: bytes) -> bytes:
    """Test-side TIFF LZW writer (MSB-first, EarlyChange): the encoder
    runs one table entry AHEAD of the decoder, so it widens at
    next == 2**w where the decoder widens at next == 2**w - 1."""
    CLEAR, EOI = 256, 257
    table = {bytes([i]): i for i in range(256)}
    nxt, width = 258, 9
    out = bytearray()
    buf = cnt = 0

    def emit(code, w):
        nonlocal buf, cnt
        buf = (buf << w) | code
        cnt += w
        while cnt >= 8:
            out.append((buf >> (cnt - 8)) & 0xFF)
            cnt -= 8
        buf &= (1 << cnt) - 1

    emit(CLEAR, width)
    cur = b""
    for v in data:
        nx = cur + bytes([v])
        if nx in table:
            cur = nx
            continue
        emit(table[cur], width)
        table[nx] = nxt
        nxt += 1
        if nxt == (1 << width) and width < 12:
            width += 1
        if nxt == 4094:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt, width = 258, 9
        cur = bytes([v])
    if cur:
        emit(table[cur], width)
    emit(EOI, width)
    if cnt:
        out.append((buf << (8 - cnt)) & 0xFF)
    return bytes(out)


def _mk_tiff(w, h, photo, spp, raw, extra_tags=(), comp=1,
             predictor=1):
    """Hand-built little-endian TIFF, independent of _encode_tiff (so
    conjugate encoder/decoder bugs cannot cancel). Any photometric /
    sample count / compression; raw is pre-compressed for comp != 1."""
    end = "<"
    entries = [(256, 4, [w]), (257, 4, [h]), (258, 3, [8] * spp),
               (259, 3, [comp]), (262, 3, [photo]), (277, 3, [spp]),
               (278, 4, [h]), (273, 4, [None]), (279, 4, [len(raw)])]
    if predictor != 1:
        entries.append((317, 3, [predictor]))
    entries.extend(extra_tags)
    entries.sort(key=lambda e: e[0])
    n = len(entries)
    extra = bytearray()
    base = 8 + 2 + 12 * n + 4
    fields = []
    for t, typ, vals in entries:
        if vals == [None]:
            fields.append((t, typ, 1, None))
            continue
        fmt = {3: "H", 4: "I"}[typ]
        size = {3: 2, 4: 4}[typ] * len(vals)
        d = struct.pack(end + str(len(vals)) + fmt, *vals)
        if size <= 4:
            fields.append((t, typ, len(vals), d + b"\x00" * (4 - size)))
        else:
            off = base + len(extra)
            extra.extend(d)
            fields.append((t, typ, len(vals), struct.pack(end + "I", off)))
    data_off = base + len(extra)
    out = bytearray(b"II" + struct.pack(end + "HI", 42, 8)
                    + struct.pack(end + "H", n))
    for t, typ, cnt, f in fields:
        if f is None:
            f = struct.pack(end + "I", data_off)
        out += struct.pack(end + "HHI", t, typ, cnt) + f
    out += struct.pack(end + "I", 0) + extra + raw
    return bytes(out)


class TestTiff:
    def test_rgb_round_trips_all_modes(self):
        from cdc_data_pipeline_spark.operators.multimodal import (
            _decode_image_stdlib, _decode_tiff, _encode_tiff)

        rng = random.Random(21)
        for (w, h) in [(1, 1), (4, 9), (7, 3), (16, 16), (13, 5)]:
            rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
            for be in (False, True):
                for comp in (1, 32773):
                    for rps in (None, 2):
                        t = _encode_tiff(w, h, rgb, compression=comp,
                                         big_endian=be,
                                         rows_per_strip=rps)
                        assert _decode_tiff(t) == (w, h, rgb), \
                            (w, h, be, comp, rps)
                        assert _decode_image_stdlib(t) == (w, h, rgb)

    def test_packbits_spec_vector(self):
        """The worked example from TIFF 6.0 §9."""
        from cdc_data_pipeline_spark.operators.multimodal import (
            _packbits_decode)

        enc = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA,
                     0x03, 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
        want = bytes([0xAA] * 3 + [0x80, 0x00, 0x2A] + [0xAA] * 4
                     + [0x80, 0x00, 0x2A, 0x22] + [0xAA] * 10)
        assert _packbits_decode(enc, len(want)) == want

    def test_photometrics_hand_built(self):
        from cdc_data_pipeline_spark.operators.multimodal import (
            _decode_tiff)

        rng = random.Random(8)
        w, h = 5, 4
        g = bytes(rng.randrange(256) for _ in range(w * h))
        assert _decode_tiff(_mk_tiff(w, h, 1, 1, g))[2] \
            == b"".join(bytes([v] * 3) for v in g)
        # WhiteIsZero inverts
        assert _decode_tiff(_mk_tiff(w, h, 0, 1, g))[2] \
            == b"".join(bytes([255 - v] * 3) for v in g)
        rgba = bytes(rng.randrange(256) for _ in range(w * h * 4))
        assert _decode_tiff(_mk_tiff(w, h, 2, 4, rgba))[2] \
            == b"".join(rgba[i * 4:i * 4 + 3] for i in range(w * h))
        cmap = [rng.randrange(65536) for _ in range(768)]
        idx = bytes(rng.randrange(256) for _ in range(w * h))
        want = b"".join(bytes([cmap[v] >> 8, cmap[256 + v] >> 8,
                               cmap[512 + v] >> 8]) for v in idx)
        assert _decode_tiff(
            _mk_tiff(w, h, 3, 1, idx,
                     extra_tags=[(320, 3, cmap)]))[2] == want

    def test_lzw_round_trip_and_predictor(self):
        from cdc_data_pipeline_spark.operators.multimodal import (
            _decode_tiff, _tiff_lzw_decode)

        rng = random.Random(5)
        for data in [bytes((i * 7 + i * i) % 256 for i in range(5000)),
                     bytes(rng.randrange(256) for _ in range(9000)),
                     b"\x00" * 4, b"abcabcabc" * 500]:
            assert _tiff_lzw_decode(_tiff_lzw_encode(data),
                                    len(data)) == data
        w, h = 9, 7
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        assert _decode_tiff(_mk_tiff(
            w, h, 2, 3, _tiff_lzw_encode(rgb), comp=5)) == (w, h, rgb)
        # predictor 2: horizontal differencing before compression
        stride = w * 3
        diff = bytearray(rgb)
        for row in range(h):
            base = row * stride
            for i in range(stride - 1, 2, -1):
                diff[base + i] = (diff[base + i]
                                  - diff[base + i - 3]) & 0xFF
        assert _decode_tiff(_mk_tiff(
            w, h, 2, 3, _tiff_lzw_encode(bytes(diff)), comp=5,
            predictor=2)) == (w, h, rgb)

    def test_corrupt_and_unsupported_raise(self):
        from cdc_data_pipeline_spark.operators.multimodal import (
            _decode_tiff, _encode_tiff)

        good = _encode_tiff(4, 4, bytes(48))
        for payload in (b"II\x2b\x00", b"nope", good[:20],
                        good[:-10]):
            with pytest.raises(ValueError):
                _decode_tiff(payload)
        with pytest.raises(ValueError, match="compression"):
            _decode_tiff(_mk_tiff(2, 2, 2, 3, bytes(12), comp=6))
        with pytest.raises(ValueError, match="tiled"):
            _decode_tiff(_mk_tiff(2, 2, 2, 3, bytes(12),
                                  extra_tags=[(322, 4, [16])]))


class TestDecompressionBombGuard:
    """ADVICE r9: a tiny payload claiming enormous dimensions must
    raise a clean ValueError BEFORE any pixel buffer is allocated —
    quarantine, never an executor OOM-kill — and every
    recognized-but-truncated container must surface as ValueError
    through the dispatch (struct.error/IndexError normalized)."""

    def test_png_bomb_rejected_fast(self):
        import time

        bomb = _PNG_SIG + _chunk(
            b"IHDR",
            struct.pack(">IIBBBBB", 65535, 65535, 8, 2, 0, 0, 0))
        bomb += _chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        bomb += _chunk(b"IEND", b"")
        t0 = time.monotonic()
        with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
            _decode_png(bomb)
        assert time.monotonic() - t0 < 1.0

    def test_png_overlong_idat_rejected(self):
        """A stream that inflates PAST the IHDR-implied filtered size
        is cut off at the bound and rejected (bounded decompressobj),
        not trusted into a huge buffer."""
        # an IDAT that inflates to far more than a 2x2 image needs
        big = zlib.compress(b"\x00" * 100_000)
        ihdr = _PNG_SIG + _chunk(
            b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        tampered = ihdr + _chunk(b"IDAT", big) + _chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="inflates past"):
            _decode_png(tampered)

    def test_bmp_gif_tiff_jpeg_bombs_rejected(self):
        from cdc_data_pipeline_spark.operators import multimodal as mm

        # BMP: 54-byte header claiming 60000x60000x24bpp
        bmp = bytearray(b"BM" + b"\x00" * 60)
        struct.pack_into("<I", bmp, 10, 54)
        struct.pack_into("<ii", bmp, 18, 60000, 60000)
        struct.pack_into("<H", bmp, 28, 24)
        struct.pack_into("<I", bmp, 30, 0)
        with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
            mm._decode_bmp(bytes(bmp))
        # GIF: image descriptor claiming 65535x65535
        gif = (b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x80, 0, 0])
               + bytes(6)                          # 2-entry GCT
               + b"\x2c" + struct.pack("<HHHH", 0, 0, 65535, 65535)
               + b"\x00" + b"\x02" + b"\x01\x00" + b"\x00" + b"\x3b")
        with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
            mm._decode_gif(gif)
        # PPM header bomb
        with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
            mm._decode_ppm(b"P6\n65535 65535\n255\n\x00")
        # JPEG SOF bomb
        from cdc_data_pipeline_spark.operators.jpegcodec import \
            decode_jpeg
        sof = struct.pack(">BHHB", 8, 65535, 65535, 1) + bytes([1, 0x11, 0])
        jpg = (b"\xFF\xD8" + b"\xFF\xC0"
               + struct.pack(">H", 2 + len(sof)) + sof + b"\xFF\xD9")
        with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
            decode_jpeg(jpg)

    def test_truncated_containers_normalize_to_value_error(self):
        """ADVICE r9: headers short enough to die inside
        struct.unpack_from must come out of the DISPATCH as
        ValueError so quarantine paths and the Pillow fallback keep a
        single exception contract."""
        cases = [
            # PNG whose IHDR data is not 13 bytes
            _PNG_SIG + _chunk(b"IHDR", b"\x00\x00"),
            # short TIFF header (dies unpacking the IFD)
            b"II\x2a\x00\x08",
            b"MM\x00\x2a\x00\x00\x00",
            # short JPEG (marker walk runs off the end)
            b"\xFF\xD8\xFF",
            b"\xFF\xD8\xFF\xC0\x00",
            # short BMP that passes the 54-byte gate but lies about
            # the pixel offset
            b"BM" + bytes(52),
            # GIF header alone
            b"GIF89a\x02",
        ]
        for payload in cases:
            with pytest.raises(ValueError):
                _decode_image_stdlib(payload)

    def test_guard_is_configurable(self):
        from cdc_data_pipeline_spark.operators import multimodal as mm

        old = mm.MAX_IMAGE_PIXELS
        try:
            mm.MAX_IMAGE_PIXELS = 8
            with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
                _decode_png(_encode_png(3, 3, bytes(27)))
            mm.MAX_IMAGE_PIXELS = 9
            assert _decode_png(_encode_png(3, 3, bytes(27)))[0] == 3
            # ADVICE r10: the JPEG codec FOLLOWS the shared knob (at
            # call time) instead of carrying an independent limit
            from cdc_data_pipeline_spark.operators.jpegcodec import (
                decode_jpeg, encode_jpeg)
            jpg = encode_jpeg(4, 3, bytes(36))
            mm.MAX_IMAGE_PIXELS = 11
            with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
                decode_jpeg(jpg)
            mm.MAX_IMAGE_PIXELS = 12
            assert decode_jpeg(jpg)[0] == 4
        finally:
            mm.MAX_IMAGE_PIXELS = old


class TestNativeDecoderDispatch:
    """VERDICT r9 #2: when a C decoder (Pillow) is installed it wins
    the dispatch; the stdlib codecs are the everywhere-fallback. The
    lossless-format agreement must be EXACT (that is what licenses
    the exact=True fast path inside the oracle-pinned entries)."""

    def test_dispatch_prefers_native_when_flagged(self, monkeypatch):
        """With a fake native engine installed, decode_image routes to
        it for non-exact calls and for lossless exact calls, but pins
        JPEG to the stdlib codec under exact=True."""
        from cdc_data_pipeline_spark.operators import multimodal as mm

        calls = []

        def fake_native(b):
            calls.append("native")
            return 1, 1, b"\x00\x00\x00"

        monkeypatch.setattr(mm, "_decode_image_native", fake_native)
        monkeypatch.setattr(mm, "PREFER_NATIVE_DECODER", True)
        png = _encode_png(1, 1, bytes(3))
        assert mm.decode_image(png) == (1, 1, b"\x00\x00\x00")
        assert calls == ["native"]
        # exact + lossless: still native
        calls.clear()
        assert mm.decode_image(png, exact=True) == (1, 1, b"\x00\x00\x00")
        assert calls == ["native"]
        # exact + JPEG: stdlib codec, native never consulted
        calls.clear()
        from cdc_data_pipeline_spark.operators.jpegcodec import \
            encode_jpeg
        jpg = encode_jpeg(8, 8, bytes([128] * 192), quality=100)
        w, h, _rgb = mm.decode_image(jpg, exact=True)
        assert (w, h) == (8, 8) and calls == []

    def test_native_failure_falls_back_to_stdlib(self, monkeypatch):
        from cdc_data_pipeline_spark.operators import multimodal as mm

        def broken_native(b):
            raise ValueError("native says no")

        monkeypatch.setattr(mm, "_decode_image_native", broken_native)
        monkeypatch.setattr(mm, "PREFER_NATIVE_DECODER", True)
        png = _encode_png(2, 2, bytes(range(12)))
        assert mm.decode_image(png) == (2, 2, bytes(range(12)))

    def test_native_absent_falls_back_to_stdlib(self, monkeypatch):
        from cdc_data_pipeline_spark.operators import multimodal as mm

        def absent_native(b):
            raise ImportError("no PIL")

        monkeypatch.setattr(mm, "_decode_image_native", absent_native)
        monkeypatch.setattr(mm, "PREFER_NATIVE_DECODER", True)
        png = _encode_png(2, 2, bytes(range(12)))
        assert mm.decode_image(png) == (2, 2, bytes(range(12)))
        with pytest.raises(ValueError):
            mm.decode_image(b"not an image at all")

    def test_native_agrees_exactly_on_lossless_formats(self):
        """Pillow and the stdlib codecs must produce IDENTICAL RGB for
        lossless formats — the license for exact=True taking the
        native path. Runs wherever Pillow exists, skips visibly
        where not."""
        pytest.importorskip("PIL.Image")
        import random as _random

        from cdc_data_pipeline_spark.operators import multimodal as mm

        rng = _random.Random(7)
        w, h = 9, 6
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        payloads = [
            _encode_png(w, h, rgb),
            mm._encode_ppm(w, h, rgb),
            mm._encode_tiff(w, h, rgb),
            mm._encode_tiff(w, h, rgb, compression=32773),
        ]
        # GIF is palette-indexed: encode indices over a gray palette
        idx = bytes(rng.randrange(256) for _ in range(w * h))
        payloads.append(_encode_gif(w, h, idx, _GRAY_PAL))
        for payload in payloads:
            assert mm._decode_image_native(payload) \
                == mm._decode_image_stdlib(payload)

    def test_native_pixel_guard_applies(self, monkeypatch):
        """The bomb guard binds the native path too."""
        pytest.importorskip("PIL.Image")
        from cdc_data_pipeline_spark.operators import multimodal as mm

        monkeypatch.setattr(mm, "MAX_IMAGE_PIXELS", 4)
        with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
            mm._decode_image_native(_encode_png(3, 3, bytes(27)))
