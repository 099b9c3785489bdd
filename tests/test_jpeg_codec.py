"""Baseline JPEG codec (pure stdlib): the final image format gate.

Pinning strategy (JPEG is lossy, so the discipline differs from the
PNG/GIF exact pins):
1. The transform kernels are pinned EXACTLY against independent math:
   zigzag vs the published constant, the basis-accumulation IDCT vs
   the direct DCT-III double sum, forward/inverse orthonormality,
   EXTEND vs hand vectors, the quality->quant-table curve vs known
   points.
2. Uniform-color images at quality=100 round-trip EXACTLY (all-ones
   quant tables make DC-only blocks lossless) — a bit-exact functional
   pin through the whole marker/Huffman/bitstream machinery.
3. General content round-trips within a small tolerance across every
   container mode (4:4:4, 4:2:0, grayscale, non-interleaved multi-scan,
   restart markers) — each mode exercises a distinct decoder path.
4. Where Pillow exists, cross-validation in both directions (our
   encoder -> Pillow decoder, Pillow encoder -> our decoder) pins the
   bitstream against an independent implementation; skipped (not
   xfailed) in sandboxes without it.
"""

import math
import random

import pytest

from cdc_data_pipeline_spark.operators.jpegcodec import (
    QUANT_CHROMA,
    QUANT_LUMA,
    ZIGZAG,
    _BitReader,
    _BitWriter,
    _extend,
    _fdct_block,
    _HuffDecoder,
    _idct_block,
    _scaled_quant,
    decode_jpeg,
    encode_jpeg,
)

# T.81 figure A.6 zigzag order (public constant)
_PUBLISHED_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


def _gradient_rgb(w, h):
    return bytes(((x * 10 + y * 3) % 256)
                 for y in range(h) for x in range(w) for _ in range(3))


class TestKernels:
    def test_zigzag_matches_published_table(self):
        assert ZIGZAG == _PUBLISHED_ZIGZAG

    def test_idct_matches_direct_double_sum(self):
        rng = random.Random(5)
        coeffs = [rng.uniform(-100, 100) for _ in range(64)]
        direct = []
        for y in range(8):
            for x in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = math.sqrt(0.5) if u == 0 else 1.0
                        cv = math.sqrt(0.5) if v == 0 else 1.0
                        s += (cu * cv * coeffs[u * 8 + v]
                              * math.cos((2 * y + 1) * u * math.pi / 16)
                              * math.cos((2 * x + 1) * v * math.pi / 16))
                direct.append(s / 4)
        ours = _idct_block(coeffs)
        assert max(abs(a - b) for a, b in zip(ours, direct)) < 1e-9

    def test_fdct_idct_orthonormal(self):
        rng = random.Random(6)
        px = [rng.uniform(-128, 127) for _ in range(64)]
        rec = _idct_block(_fdct_block(px))
        assert max(abs(a - b) for a, b in zip(px, rec)) < 1e-9

    def test_extend_hand_vectors(self):
        # T.81 EXTEND: t-bit magnitude -> signed value
        assert _extend(0, 0) == 0
        assert _extend(1, 1) == 1
        assert _extend(0, 1) == -1
        assert _extend(0b10, 2) == 2
        assert _extend(0b01, 2) == -2
        assert _extend(0b00, 2) == -3
        assert _extend(0b111, 3) == 7
        assert _extend(0b000, 3) == -7

    def test_quality_curve(self):
        assert _scaled_quant(QUANT_LUMA, 100) == tuple([1] * 64)
        assert _scaled_quant(QUANT_LUMA, 50) == QUANT_LUMA
        assert _scaled_quant(QUANT_CHROMA, 50) == QUANT_CHROMA
        # K.1 spot values
        assert QUANT_LUMA[0] == 16 and QUANT_LUMA[63] == 99
        assert QUANT_CHROMA[0] == 17
        with pytest.raises(ValueError):
            _scaled_quant(QUANT_LUMA, 0)


class TestHuffmanBitstream:
    def test_hand_built_table_decodes_hand_packed_bits(self):
        # BITS: one 1-bit code, two 3-bit codes -> canonical codes
        # 0 (len1), 100, 101 (len3); symbols A=7, B=3, C=9
        bits = [1, 0, 2] + [0] * 13
        table = _HuffDecoder(bits, [7, 3, 9])
        # pack: 0 100 101 0 -> byte 0b01001010 = 0x4A
        reader = _BitReader(bytes([0x4A]), 0)
        assert reader.huff(table) == 7
        assert reader.huff(table) == 3
        assert reader.huff(table) == 9
        assert reader.huff(table) == 7

    def test_byte_stuffing_round_trip(self):
        w = _BitWriter()
        w.write(0xFF, 8)        # forces a stuffed 0x00
        w.write(0xAB, 8)
        w.flush()
        assert bytes(w.out) == b"\xFF\x00\xAB"
        r = _BitReader(bytes(w.out), 0)
        assert r.receive(8) == 0xFF
        assert r.receive(8) == 0xAB

    def test_marker_inside_stream_raises(self):
        r = _BitReader(b"\xFF\xD9", 0)
        with pytest.raises(ValueError):
            r.receive(8)


class TestRoundTrip:
    def test_uniform_exact_at_q100(self):
        for col in [(0, 0, 0), (255, 255, 255), (128, 64, 200),
                    (17, 230, 99)]:
            rgb = bytes(col) * (16 * 24)
            assert decode_jpeg(encode_jpeg(16, 24, rgb, quality=100)) \
                == (16, 24, rgb)

    def test_uniform_exact_every_container_mode(self):
        rgb = bytes((77, 150, 30)) * (20 * 12)
        for kw in (dict(), dict(interleave=False),
                   dict(restart_interval=2), dict(subsample=True)):
            got = decode_jpeg(encode_jpeg(20, 12, rgb, quality=100, **kw))
            assert got == (20, 12, rgb), kw

    @pytest.mark.parametrize("kw", [
        dict(quality=90),
        dict(quality=95, subsample=True),
        dict(quality=90, interleave=False),
        dict(quality=90, restart_interval=2),
        dict(quality=90, interleave=False, restart_interval=1),
        dict(quality=95, subsample=True, restart_interval=3),
    ])
    def test_gradient_tolerance_all_modes(self, kw):
        w, h = 20, 12
        rgb = _gradient_rgb(w, h)
        dw, dh, out = decode_jpeg(encode_jpeg(w, h, rgb, **kw))
        assert (dw, dh) == (w, h)
        assert max(abs(a - b) for a, b in zip(out, rgb)) <= 4, kw

    def test_grayscale_stream(self):
        w, h = 20, 12
        rgb = _gradient_rgb(w, h)
        dw, dh, out = decode_jpeg(encode_jpeg(w, h, rgb, quality=95,
                                              gray=True))
        assert (dw, dh) == (w, h)
        for i in range(w * h):
            r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
            luma = 0.299 * r + 0.587 * g + 0.114 * b
            assert abs(out[3 * i] - luma) <= 2
            assert out[3 * i] == out[3 * i + 1] == out[3 * i + 2]

    @pytest.mark.parametrize("dims", [(1, 1), (7, 5), (9, 17), (8, 8),
                                      (3, 11), (33, 9)])
    def test_odd_dims_mcu_padding(self, dims):
        w, h = dims
        rgb = bytes(((x * 31 + y * 7) % 256)
                    for y in range(h) for x in range(w) for _ in range(3))
        dw, dh, out = decode_jpeg(encode_jpeg(w, h, rgb, quality=98))
        assert (dw, dh) == (w, h)
        assert max(abs(a - b) for a, b in zip(out, rgb)) <= 4

    def test_noise_bounded_even_at_low_quality(self):
        rng = random.Random(9)
        w, h = 16, 16
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        dw, dh, out = decode_jpeg(encode_jpeg(w, h, rgb, quality=50))
        assert (dw, dh) == (w, h)
        # lossy, but the mean error must stay moderate
        mean_err = sum(abs(a - b) for a, b in zip(out, rgb)) / len(rgb)
        assert mean_err < 40


class TestQuarantine:
    def test_corrupt_variants_raise(self):
        good = encode_jpeg(20, 12, _gradient_rgb(20, 12))
        for payload in (b"\xFF\xD8", good[:40], b"nope", b""):
            with pytest.raises(ValueError):
                decode_jpeg(payload)

    def test_forged_sof2_on_baseline_scan_still_quarantines(self):
        """r10: SOF2 now DECODES, but a baseline stream whose marker
        was merely rewritten to SOF2 carries a scan header no legal
        progressive stream can have (Ss=0 with Se=63) — it must still
        come out as ValueError, never garbage pixels."""
        good = encode_jpeg(8, 8, bytes(192))
        prog = good.replace(b"\xFF\xC0", b"\xFF\xC2", 1)
        with pytest.raises(ValueError):
            decode_jpeg(prog)

    def test_unsupported_sof_markers_still_raise(self):
        good = encode_jpeg(8, 8, bytes(192))
        for sof in (b"\xFF\xC3", b"\xFF\xCA"):   # lossless, arith prog
            with pytest.raises(ValueError, match="SOF"):
                decode_jpeg(good.replace(b"\xFF\xC0", sof, 1))


class TestPillowCrossValidation:
    """Bitstream conformance against an independent implementation —
    runs wherever Pillow exists, skips (visibly) where not."""

    @pytest.fixture()
    def pil(self):
        return pytest.importorskip("PIL.Image")

    def test_pillow_decodes_our_files(self, pil):
        import io

        w, h = 20, 12
        rgb = _gradient_rgb(w, h)
        for kw in (dict(quality=95), dict(quality=95, subsample=True),
                   dict(quality=95, restart_interval=2)):
            img = pil.open(io.BytesIO(encode_jpeg(w, h, rgb, **kw)))
            assert img.size == (w, h)
            theirs = bytes(v for px in img.convert("RGB").getdata()
                           for v in px)
            ours = decode_jpeg(encode_jpeg(w, h, rgb, **kw))[2]
            diff = max(abs(a - b) for a, b in zip(theirs, ours))
            # upsampling/IDCT implementations legitimately differ by a
            # few levels; gross disagreement means a bitstream bug
            assert diff <= 8, kw

    def test_we_decode_pillow_files(self, pil):
        import io

        w, h = 20, 12
        rgb = _gradient_rgb(w, h)
        img = pil.frombytes("RGB", (w, h), rgb)
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=95)
        dw, dh, ours = decode_jpeg(buf.getvalue())
        assert (dw, dh) == (w, h)
        assert max(abs(a - b) for a, b in zip(ours, rgb)) <= 24


class TestSparkSeam:
    def test_jpeg_features_close_to_ppm_truth(self, spark):
        """JPEG payloads flow through the SAME mapInPandas featurizer;
        dims/n_pixels are exact and gray stats sit within the lossy
        tolerance of the PPM ground truth."""
        from cdc_data_pipeline_spark.operators.multimodal import (
            extract_image_features)

        rows = []
        truth = {}
        for doc_id in range(1, 7):
            w, h = 12, 16 + doc_id
            rgb = bytes(((x * 9 + y * 5 + doc_id) % 256)
                        for y in range(h) for x in range(w)
                        for _ in range(3))
            gray = [(rgb[3 * i] + rgb[3 * i + 1] + rgb[3 * i + 2]) / 3.0
                    for i in range(w * h)]
            truth[doc_id] = (w, h, sum(gray) / len(gray))
            rows.append((doc_id, encode_jpeg(w, h, rgb, quality=98)))
        media = spark.createDataFrame(rows, "media_id long, payload binary")
        feats = {r.media_id: r for r in
                 extract_image_features(media).collect()}
        for doc_id, (w, h, mean_gray) in truth.items():
            r = feats[doc_id]
            assert r.decode_error is None
            assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
            assert abs(r.mean_gray - mean_gray) < 1.5

    def test_progressive_decodes_on_spark(self, spark):
        """r10: a REAL progressive stream featurizes IDENTICALLY to
        its baseline twin through the Arrow-batched featurizer (same
        quality -> same coefficients -> byte-equal pixels), while a
        forged SOF2-with-baseline-scan stream still quarantines."""
        from cdc_data_pipeline_spark.operators.jpegcodec import \
            encode_jpeg_progressive
        from cdc_data_pipeline_spark.operators.multimodal import (
            extract_image_features)

        rgb = _gradient_rgb(16, 16)
        base = encode_jpeg(16, 16, rgb, quality=90)
        prog = encode_jpeg_progressive(16, 16, rgb, quality=90)
        forged = base.replace(b"\xFF\xC0", b"\xFF\xC2", 1)
        media = spark.createDataFrame(
            [(1, base), (2, prog), (3, forged)],
            "media_id long, payload binary")
        out = {r.media_id: r for r in
               extract_image_features(media).collect()}
        assert out[1].decode_error is None and out[2].decode_error is None
        assert out[1].mean_gray == out[2].mean_gray
        assert out[1].ahash == out[2].ahash
        assert out[3].decode_error is not None


class TestProgressive:
    """SOF2 decode (T.81 Annex G) pinned without an external codec:
    at the same quality the progressive and baseline encoders quantize
    to the SAME coefficients, so decode(progressive) must equal
    decode(baseline) BYTE-EXACTLY — any drift in spectral-band
    assembly, successive-approximation bits, EOB runs or buffered
    corrections breaks the equality (r10)."""

    @pytest.mark.parametrize("kw", [
        dict(),
        dict(subsample=True),
        dict(gray=True),
        dict(restart_interval=2),
        dict(subsample=True, restart_interval=1),
        dict(al=0),                         # spectral selection only
        dict(al=2),                         # two refinement levels
        dict(al=3, subsample=True, restart_interval=3),
    ])
    def test_equals_baseline_decode(self, kw):
        import random

        from cdc_data_pipeline_spark.operators.jpegcodec import \
            encode_jpeg_progressive

        rng = random.Random(11)
        al = kw.pop("al", 1)
        for w, h in ((16, 12), (17, 9)):
            if kw.get("subsample") and (w % 2 or h % 2):
                w, h = w + 1, h + 1
            rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
            base = decode_jpeg(encode_jpeg(w, h, rgb, quality=85, **kw))
            prog = decode_jpeg(encode_jpeg_progressive(
                w, h, rgb, quality=85, al=al, **kw))
            assert prog == base, (w, h, al, kw)

    def test_uniform_exact_at_q100(self):
        from cdc_data_pipeline_spark.operators.jpegcodec import \
            encode_jpeg_progressive

        rgb = bytes([120] * (8 * 8 * 3))
        w, h, dec = decode_jpeg(encode_jpeg_progressive(
            8, 8, rgb, quality=100))
        assert (w, h) == (8, 8) and bytes(dec) == rgb

    def test_eob_runs_span_blocks(self):
        """A mostly-flat image makes most blocks empty in the AC band:
        EOBn symbols with multi-block runs (and their buffered
        refinement corrections) must reproduce the baseline decode."""
        from cdc_data_pipeline_spark.operators.jpegcodec import \
            encode_jpeg_progressive

        w, h = 64, 24                       # 24 MCUs, mostly flat
        rgb = bytearray([200] * (w * h * 3))
        for i in range(0, 30, 3):           # sparse detail in one block
            rgb[i] = 10
        rgb = bytes(rgb)
        base = decode_jpeg(encode_jpeg(w, h, rgb, quality=85))
        prog = decode_jpeg(encode_jpeg_progressive(
            w, h, rgb, quality=85, al=2))
        assert prog == base

    def test_bad_refinement_magnitude_raises(self):
        """A refinement scan symbol with size != 1 is corrupt."""
        from cdc_data_pipeline_spark.operators.jpegcodec import \
            encode_jpeg_progressive

        prog = encode_jpeg_progressive(16, 12, _gradient_rgb(16, 12),
                                       quality=85, al=1)
        # flipping entropy bytes in the last scan (AC refinement) must
        # either decode to SOMETHING or raise ValueError — never crash
        # with a non-ValueError (the dispatch normalization contract)
        blob = bytearray(prog)
        for off in (-20, -40, -60):
            tampered = bytearray(blob)
            if tampered[off] not in (0xFF, 0x00, 0xD9):
                tampered[off] ^= 0x55
                try:
                    decode_jpeg(bytes(tampered))
                except ValueError:
                    pass

    def test_truncated_progressive_raises(self):
        from cdc_data_pipeline_spark.operators.jpegcodec import \
            encode_jpeg_progressive

        prog = encode_jpeg_progressive(16, 12, _gradient_rgb(16, 12))
        for cut in (len(prog) // 2, len(prog) - 10):
            with pytest.raises(ValueError):
                decode_jpeg(prog[:cut])

    def test_pillow_decodes_our_progressive(self):
        """Bitstream conformance against an independent decoder —
        runs wherever Pillow exists, skips visibly where not."""
        pil = pytest.importorskip("PIL.Image")
        import io

        from cdc_data_pipeline_spark.operators.jpegcodec import \
            encode_jpeg_progressive

        w, h = 20, 12
        rgb = _gradient_rgb(w, h)
        for kw in (dict(al=1), dict(al=2, subsample=True),
                   dict(al=1, restart_interval=2)):
            payload = encode_jpeg_progressive(w, h, rgb, quality=95,
                                              **kw)
            img = pil.open(io.BytesIO(payload))
            assert img.size == (w, h)
            theirs = bytes(v for px in img.convert("RGB").getdata()
                           for v in px)
            ours = decode_jpeg(payload)[2]
            diff = max(abs(a - b) for a, b in zip(theirs, ours))
            assert diff <= 8, kw

    def test_we_decode_pillow_progressive(self):
        pil = pytest.importorskip("PIL.Image")
        import io

        w, h = 20, 12
        rgb = _gradient_rgb(w, h)
        img = pil.frombytes("RGB", (w, h), rgb)
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=95, progressive=True)
        dw, dh, ours = decode_jpeg(buf.getvalue())
        assert (dw, dh) == (w, h)
        assert max(abs(a - b) for a, b in zip(ours, rgb)) <= 24


class TestProgressiveProperty:
    """Randomized pin: for ANY image and any legal (quality, Al,
    subsample, restart) combination, progressive decode equals
    baseline decode byte-exactly — the same-coefficients invariant,
    hypothesis-explored."""

    def test_random_images_and_params(self):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from cdc_data_pipeline_spark.operators.jpegcodec import \
            encode_jpeg_progressive

        @given(
            w=st.integers(4, 20), h=st.integers(4, 20),
            seed=st.integers(0, 2**31),
            quality=st.sampled_from([60, 85, 100]),
            al=st.integers(0, 2),
            subsample=st.booleans(),
            rst=st.sampled_from([0, 1, 3]),
        )
        @settings(max_examples=12, deadline=None,
                  suppress_health_check=[HealthCheck.too_slow])
        def check(w, h, seed, quality, al, subsample, rst):
            rng = random.Random(seed)
            rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
            kw = dict(quality=quality, subsample=subsample,
                      restart_interval=rst)
            base = decode_jpeg(encode_jpeg(w, h, rgb, **kw))
            prog = decode_jpeg(encode_jpeg_progressive(
                w, h, rgb, al=al, **kw))
            assert prog == base

        check()
