"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as ``binary`` columns alongside a
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched Pandas iterators via ``mapInPandas``. The default
``decode_stub=True`` computes deterministic fake features from the raw
bytes (no decode libraries needed — the Spark-side plumbing: schema,
batch shape, partitioning, UDF signature, is real and tested
everywhere). ``decode_stub=False`` switches to REAL image decode.

No image decode needs an external library: P6 PPM and 24-bit BMP
decode by raw byte math, PNG by stdlib ``zlib`` (chunk CRCs, inflate,
all five scanline filters, Adam7 de-interlacing, all five 8-bit color
types), GIF by pure-Python LZW (87a/89a, interlace, local/global
palettes), and baseline JPEG by a pure-Python Huffman + IDCT pipeline
(``operators.jpegcodec``) — so real compressed-image decode runs and
is tested in every sandbox. Pillow, where installed, serves only as
an optional fallback for exotic formats (WebP/TIFF/progressive JPEG)
and as a cross-validation axis in the test suite.

Scale notes: binary payloads dominate row size — repartition by a
content-size bucket before mapInPandas so Arrow batches stay bounded;
never groupBy/shuffle the binary column itself (carry an id, join
features back by id if needed).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("first_byte", T.IntegerType(), True),
    T.StructField("byte_checksum", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def documents_as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media-shaped frame from the documents fixture: the utf-8
    bytes of the text stand in for an opaque payload."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


# Dispatch preference (VERDICT r9 #2): when a C decoder (Pillow /
# libjpeg) is installed, it should win the dispatch — the pure-Python
# JPEG/PNG inner loops are 2-3 orders of magnitude slower per image,
# which is correctness-everywhere insurance, not a 100 TB decode
# plan. Flip to False to force the stdlib codecs even where Pillow
# exists (bit-reproducibility drills, codec debugging).
PREFER_NATIVE_DECODER = True

# Pillow modes whose RGB conversion is exactly the stdlib decoders'
# semantics (8-bit; alpha DROPPED not composited; palette expanded;
# gray replicated). Anything else (16-bit PNG "I;16", CMYK, ...)
# falls back to the stdlib decoder so behavior never silently widens
# on the exact-parity path.
_NATIVE_EXACT_MODES = frozenset({"RGB", "RGBA", "L", "LA", "P", "1"})


def _decode_image_native(b: bytes):
    """Decode via Pillow (C codecs), normalized to the stdlib
    contract: (width, height, flat top-down RGB bytes), alpha dropped,
    ValueError on anything unsupported/malformed (so callers'
    quarantine paths stay single-exception). Raises ImportError when
    Pillow is absent — callers treat that as 'no native engine'."""
    import io

    from PIL import Image

    try:
        img = Image.open(io.BytesIO(b))
        if img.mode not in _NATIVE_EXACT_MODES:
            raise ValueError(
                f"Pillow mode {img.mode!r} outside the exact-contract "
                "set — deferring to the stdlib decoder")
        if img.mode == "P":
            img = img.convert("RGB")
        elif img.mode in ("LA", "1"):
            img = img.convert("L")
        w, h = img.size
        if w * h > MAX_IMAGE_PIXELS:
            raise ValueError(
                f"image dimensions {w}x{h} exceed MAX_IMAGE_PIXELS="
                f"{MAX_IMAGE_PIXELS} — decompression-bomb guard")
        raw = img.tobytes()
        if img.mode == "RGB":
            return w, h, raw
        if img.mode == "RGBA":                 # drop alpha, no composite
            out = bytearray(w * h * 3)
            out[0::3] = raw[0::4]
            out[1::3] = raw[1::4]
            out[2::3] = raw[2::4]
            return w, h, bytes(out)
        # L: replicate gray
        out = bytearray(w * h * 3)
        out[0::3] = raw
        out[1::3] = raw
        out[2::3] = raw
        return w, h, bytes(out)
    except ValueError:
        raise
    except ImportError:
        raise
    except Exception as exc:                   # Pillow's zoo of errors
        raise ValueError(
            f"native decode failed ({type(exc).__name__}: {exc})")


def decode_image(b: bytes, prefer_native: bool | None = None,
                 exact: bool = False):
    """THE image decode dispatch. ``prefer_native=None`` follows the
    module flag ``PREFER_NATIVE_DECODER``. With a native engine
    preferred and installed, Pillow decodes and the stdlib codecs are
    the everywhere-fallback; otherwise stdlib first with Pillow as the
    exotic-format fallback (WebP, progressive JPEG, ...).

    ``exact=True`` is the bit-reproducibility contract the oracle-
    pinned catalog entries need: JPEG always decodes through the
    pinned stdlib codec (IDCT rounding is decoder-dependent, so
    libjpeg and ``jpegcodec`` may differ by ±1/sample), while lossless
    formats (PPM/PGM/BMP/PNG/GIF/TIFF) may still take the native fast
    path — their decoded RGB is format-defined and the Pillow/stdlib
    agreement is pinned exactly by tests. Returns
    (width, height, flat RGB bytes); raises ValueError otherwise."""
    if prefer_native is None:
        prefer_native = PREFER_NATIVE_DECODER
    jpeg = b.startswith(b"\xFF\xD8")
    if prefer_native and not (exact and jpeg):
        try:
            return _decode_image_native(b)
        except (ImportError, ValueError):
            pass                               # stdlib fallback below
    try:
        return _decode_image_stdlib(b)
    except ValueError as stdlib_err:
        if prefer_native:
            raise                              # native already tried
        try:
            return _decode_image_native(b)
        except ImportError:
            raise stdlib_err
        except ValueError:
            raise stdlib_err


def _decode_image_any(b: bytes):
    """Back-compat alias: real image decode with no required
    dependency — native (Pillow) preferred when installed per
    ``PREFER_NATIVE_DECODER``, stdlib codecs as the guaranteed
    fallback. Returns (width, height, flat RGB bytes)."""
    return decode_image(b)


def extract_features(media: DataFrame, decode_stub: bool = True, feature_dim: int = 4) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    With ``decode_stub=True`` the "decoder" computes deterministic fake
    features from the raw bytes (length, first byte, additive checksum,
    and a fixed-dim folded-byte histogram). With ``decode_stub=False``
    the payload is decoded as an IMAGE — stdlib codecs
    (PPM/BMP/PNG/GIF/baseline JPEG) with Pillow as an optional
    fallback for exotic formats, see ``_decode_image_any`` — and the
    feature is the mean grayscale intensity of ``feature_dim``
    horizontal bands — a real, deterministic pixel-space signature.
    Either way the signature, schema, and Arrow batch shape are
    identical; audio/video decoders slot into the same seam.
    """
    # no forced repartition here: shuffling binary payloads costs more
    # than the stub featurization saves. With a REAL decoder (10-100ms
    # per item) callers should `df.repartition(n)` first — the shuffle
    # amortizes instantly at that per-row cost.

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes, first_byte, checksum, feats = [], [], [], []
            for raw in payloads:
                b = bytes(raw) if raw is not None else b""
                n_bytes.append(len(b))
                first_byte.append(b[0] if b else 0)
                checksum.append(sum(b) % (1 << 31))
                if decode_stub:
                    hist = [0.0] * feature_dim
                    for i, byte in enumerate(b):
                        hist[i % feature_dim] += float(byte)
                    feats.append([v / max(len(b), 1) for v in hist])
                    continue
                w, h, rgb = _decode_image_any(b)
                px = [(rgb[i] + rgb[i + 1] + rgb[i + 2]) / 3.0
                      for i in range(0, len(rgb), 3)]
                bands = [0.0] * feature_dim
                counts = [0] * feature_dim
                for row in range(h):
                    band = min(row * feature_dim // max(h, 1),
                               feature_dim - 1)
                    seg = px[row * w:(row + 1) * w]
                    bands[band] += float(sum(seg))
                    counts[band] += len(seg)
                feats.append([bands[i] / counts[i] if counts[i] else 0.0
                              for i in range(feature_dim)])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": n_bytes,
                "first_byte": first_byte,
                "byte_checksum": checksum,
                "feature": feats,
            })

    return media.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def _mulaw_decode_byte(c: int) -> int:
    """G.711 mu-law expansion of one code byte to a 14-bit-range
    linear sample (ITU-T G.711 table 2a/2b algorithmic form)."""
    c = ~c & 0xFF
    sign = c & 0x80
    exp = (c >> 4) & 0x07
    mant = c & 0x0F
    x = (((mant << 3) + 0x84) << exp) - 0x84
    return -x if sign else x


def _alaw_decode_byte(c: int) -> int:
    """G.711 A-law expansion of one code byte to a 13-bit-range
    linear sample (ITU-T G.711 table 1a/1b algorithmic form)."""
    c ^= 0x55
    sign = c & 0x80                          # bit 7 SET = positive
    exp = (c >> 4) & 0x07
    mant = c & 0x0F
    if exp == 0:
        x = (mant << 4) + 8
    else:
        x = ((mant << 4) + 0x108) << (exp - 1)
    return x if sign else -x


def _parse_riff_wav(b: bytes):
    """Manual RIFF/WAVE chunk walk for the formats the stdlib ``wave``
    module rejects: IEEE float (format 3, 32/64-bit), G.711 mu-law
    (7) and A-law (6), 24-bit integer PCM, and WAVE_FORMAT_EXTENSIBLE
    (0xFFFE, resolved by its SubFormat GUID's leading code). Returns
    (n_channels, sample_rate, interleaved numeric samples) — floats
    stay floats, everything else integers, matching what the RMS/FFT
    featurizers consume."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid, ln = b[pos:pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)             # chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    code, nch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if code == 0xFFFE:                       # extensible: GUID leads
        if len(fmt) < 26:
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt")
        code = struct.unpack_from("<H", fmt, 24)[0]
    if nch < 1 or rate <= 0:
        raise ValueError("invalid WAV fmt")
    if code == 3 and bits == 32:
        n = len(data) // 4
        samples = list(struct.unpack(f"<{n}f", data[:n * 4]))
    elif code == 3 and bits == 64:
        n = len(data) // 8
        samples = list(struct.unpack(f"<{n}d", data[:n * 8]))
    elif code == 7 and bits == 8:
        samples = [_mulaw_decode_byte(c) for c in data]
    elif code == 6 and bits == 8:
        samples = [_alaw_decode_byte(c) for c in data]
    elif code == 1 and bits == 24:
        samples = []
        for i in range(0, len(data) - 2, 3):
            v = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
            samples.append(v - (1 << 24) if v >= (1 << 23) else v)
    elif code == 1 and bits in (8, 16, 32):
        import array

        if bits == 8:
            samples = [s - 128 for s in data]
        else:
            samples = array.array("h" if bits == 16 else "i")
            step = bits // 8
            samples.frombytes(data[: len(data) // step * step])
    else:
        raise ValueError(
            f"unsupported WAV format code {code} / {bits}-bit")
    return nch, rate, samples


def _decode_au(b: bytes):
    """Sun AU (.snd) decode: big-endian 24-byte-minimum header (magic,
    data offset, data size, encoding, sample rate, channels) followed
    by samples. Encodings: 1 G.711 mu-law, 2 signed 8-bit PCM, 3/4/5
    signed 16/24/32-bit big-endian PCM, 6/7 IEEE float/double
    big-endian, 27 G.711 A-law."""
    import struct

    if len(b) < 24 or b[:4] != b".snd":
        raise ValueError("not a Sun AU (.snd) stream")
    off, size, enc, rate, nch = struct.unpack_from(">IIIII", b, 4)
    if off < 24 or off > len(b) or nch < 1 or rate <= 0:
        raise ValueError("invalid AU header")
    data = b[off:off + size] if size != 0xFFFFFFFF else b[off:]
    if enc == 1:
        samples = [_mulaw_decode_byte(c) for c in data]
    elif enc == 27:
        samples = [_alaw_decode_byte(c) for c in data]
    elif enc == 2:
        samples = [c - 256 if c >= 128 else c for c in data]
    elif enc in (3, 4, 5):
        width = {3: 2, 4: 3, 5: 4}[enc]
        samples = []
        for i in range(0, len(data) - width + 1, width):
            v = int.from_bytes(data[i:i + width], "big", signed=True)
            samples.append(v)
    elif enc in (6, 7):
        fmt, width = (">f", 4) if enc == 6 else (">d", 8)
        n = len(data) // width
        samples = list(struct.unpack(f">{n}{fmt[-1]}",
                                     data[:n * width]))
    else:
        raise ValueError(f"unsupported AU encoding {enc}")
    return nch, rate, samples


def _decode_aiff(b: bytes):
    """AIFF decode by manual IFF chunk walk (the stdlib ``aifc``
    module is deprecated/removed post-3.12): big-endian FORM/AIFF,
    COMM (channels, frames, bits, 80-bit extended-float sample rate),
    SSND (offset/blocksize header then big-endian signed PCM,
    8/16/24/32-bit). AIFC is accepted when its compression type is
    ``NONE`` (raw big-endian PCM); actual codecs raise."""
    import struct

    if len(b) < 12 or b[:4] != b"FORM" \
            or b[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF stream")
    is_aifc = b[8:12] == b"AIFC"
    pos = 12
    comm = ssnd = None
    while pos + 8 <= len(b):
        cid, ln = b[pos:pos + 4], struct.unpack_from(">I", b, pos + 4)[0]
        body = b[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)             # chunks are word-aligned
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
    if comm is None or len(comm) < 18 or ssnd is None or len(ssnd) < 8:
        raise ValueError("AIFF missing COMM/SSND chunk")
    if is_aifc:
        ctype = comm[18:22] if len(comm) >= 22 else b""
        if ctype != b"NONE":
            raise ValueError(
                f"unsupported AIFC compression {ctype!r}")
    nch, _frames, bits = struct.unpack_from(">HIH", comm, 0)
    # 80-bit IEEE 754 extended float: 1 sign + 15 exponent bits, then
    # an explicit-leading-bit 64-bit mantissa
    exp = struct.unpack_from(">H", comm, 8)[0]
    mant = int.from_bytes(comm[10:18], "big")
    if exp == 0 and mant == 0:
        raise ValueError("AIFF zero sample rate")
    rate = int(round(mant * 2.0 ** ((exp & 0x7FFF) - 16383 - 63)))
    if nch < 1 or rate <= 0 or bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported AIFF layout ({nch}ch/{bits}bit)")
    data_off = struct.unpack_from(">I", ssnd, 0)[0]
    data = ssnd[8 + data_off:]
    width = bits // 8
    samples = []
    for i in range(0, len(data) - width + 1, width):
        samples.append(int.from_bytes(data[i:i + width], "big",
                                      signed=True))
    return nch, rate, samples


def _decode_audio(b: bytes):
    """Container dispatch for the stdlib-only audio decoders — the
    audio twin of ``_decode_image_stdlib``: RIFF/WAVE (stdlib ``wave``
    + manual fallback), Sun AU, and AIFF all decode dependency-free.
    Perceptual codecs (MP3/AAC/Opus) raise and quarantine."""
    if b[:4] == b".snd":
        return _decode_au(b)
    if b[:4] == b"FORM" and b[8:12] in (b"AIFF", b"AIFC"):
        return _decode_aiff(b)
    return _decode_wav_pcm(b)


def _decode_wav_pcm(b: bytes):
    """(n_channels, sample_rate, interleaved numeric samples) from a
    WAV container. Integer PCM rides the stdlib ``wave`` module
    (8-bit unsigned re-centered; 16/32-bit signed little-endian);
    formats ``wave`` rejects — IEEE float 32/64, G.711 mu-law/A-law,
    24-bit PCM, WAVE_FORMAT_EXTENSIBLE — fall back to the manual RIFF
    parser (``_parse_riff_wav``), so no audio container is
    dependency-gated. Raises on anything else — callers decide whether
    that quarantines (feature extraction) or propagates (tests)."""
    import array
    import io
    import wave

    try:
        with wave.open(io.BytesIO(b), "rb") as w:
            nch, sw = w.getnchannels(), w.getsampwidth()
            rate, nf = w.getframerate(), w.getnframes()
            raw = w.readframes(nf)
    except (wave.Error, EOFError):
        return _parse_riff_wav(b)
    if sw == 1:
        samples = [s - 128 for s in raw]
    elif sw == 2:
        samples = array.array("h")
        samples.frombytes(raw[: len(raw) // 2 * 2])
    elif sw == 4:
        samples = array.array("i")
        samples.frombytes(raw[: len(raw) // 4 * 4])
    elif sw == 3:
        samples = []
        for i in range(0, len(raw) - 2, 3):
            v = raw[i] | (raw[i + 1] << 8) | (raw[i + 2] << 16)
            samples.append(v - (1 << 24) if v >= (1 << 23) else v)
    else:
        raise ValueError(f"unsupported sample width {sw}")
    return nch, rate, samples


AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("band_rms", T.ArrayType(T.DoubleType()), True),
    T.StructField("decode_error", T.StringType(), True),
])


def extract_audio_features(media: DataFrame,
                           n_bands: int = 4) -> DataFrame:
    """REAL audio decode on the media seam: WAV payloads are parsed
    with the stdlib ``wave`` module (manual RIFF fallback for the
    formats it rejects) inside the same Arrow-batched ``mapInPandas``
    shape as the image path — no external dependency, so this path
    runs (and is tested) everywhere. Emits channel count, sample
    rate, exact duration, overall RMS, and RMS over ``n_bands`` equal
    time slices (the classic energy-envelope feature for silence
    trimming / segment selection in a speech-data pipeline). A payload
    that is not a decodable WAV yields NULL features and the error
    string instead of failing the job — at 100 TB a corrupt object
    must quarantine, not kill the stage. 8/16/24/32-bit integer PCM,
    IEEE float 32/64, G.711 mu-law/A-law, and WAVE_FORMAT_EXTENSIBLE
    all decode; perceptual codecs (MP3/AAC/Opus) stay a documented
    seam."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        def decode(b: bytes):
            nch, rate, samples = _decode_audio(b)
            nf = len(samples) // max(nch, 1)
            n = len(samples)
            full = math.sqrt(sum(float(s) * s for s in samples) / n) \
                if n else 0.0
            bands = []
            per = max(n // n_bands, 1)
            for i in range(n_bands):
                seg = samples[i * per: (i + 1) * per] \
                    if i < n_bands - 1 else samples[(n_bands - 1) * per:]
                bands.append(
                    math.sqrt(sum(float(s) * s for s in seg) / len(seg))
                    if len(seg) else 0.0)
            return (nch, rate, nf,
                    int(nf * 1000 // rate) if rate else 0, full, bands)

        for pdf in batches:
            cols = {k: [] for k in ("n_channels", "sample_rate",
                                    "n_samples", "duration_ms", "rms",
                                    "band_rms", "decode_error")}
            for raw in pdf["payload"]:
                try:
                    nch, rate, nf, dur, full, bands = decode(
                        bytes(raw) if raw is not None else b"")
                    vals = (nch, rate, nf, dur, full, bands, None)
                except Exception as ex:  # quarantine, don't kill
                    vals = (None, None, None, None, None, None,
                            f"{type(ex).__name__}: {ex}")
                for k, v in zip(cols, vals):
                    cols[k].append(v)
            yield pd.DataFrame({"media_id": pdf["media_id"], **cols})

    return media.mapInPandas(featurize, schema=AUDIO_FEATURE_SCHEMA)


SPECTRAL_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("spectral_centroid_hz", T.DoubleType(), True),
    T.StructField("dominant_band", T.IntegerType(), True),
    T.StructField("band_energy", T.ArrayType(T.DoubleType()), True),
    T.StructField("fingerprint", T.LongType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def audio_spectral_features(media: DataFrame, n_bins: int = 8) -> DataFrame:
    """REAL frequency-domain audio features: PCM WAV -> channel-mixed
    mono -> numpy rFFT -> energy per ``n_bins`` equal frequency bands
    (normalized to fractions), spectral centroid in Hz, the dominant
    band, and a 64-bit fingerprint (one bit per adjacent-band energy
    comparison over 64 log-spaced sub-bands — the Haitsma-Kalker
    sign-of-difference scheme, robust to gain changes because energy
    RATIOS survive amplitude scaling). This is the audio analogue of
    SimHash for text: near-identical recordings land on near-identical
    bit patterns, so exact/Hamming fingerprint matching feeds the same
    dedup machinery the text side uses. Corrupt payloads quarantine
    with ``decode_error``, as in ``extract_audio_features``."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def decode(b: bytes):
            nch, rate, samples = _decode_audio(b)
            x = np.asarray(samples, dtype=np.float64)
            if nch > 1:
                x = x[: len(x) // nch * nch].reshape(-1, nch).mean(axis=1)
            if len(x) == 0 or rate <= 0:
                raise ValueError("empty audio payload")
            mag = np.abs(np.fft.rfft(x))
            power = mag * mag
            freqs = np.fft.rfftfreq(len(x), d=1.0 / rate)
            total = float(power.sum())
            centroid = float((freqs * power).sum() / total) \
                if total > 0 else 0.0
            # equal-width coarse bands (fractions of total energy)
            edges = np.linspace(0, len(power), n_bins + 1).astype(int)
            be = [float(power[edges[i]:edges[i + 1]].sum())
                  for i in range(n_bins)]
            bsum = sum(be) or 1.0
            be = [v / bsum for v in be]
            dom = int(max(range(n_bins), key=lambda i: be[i]))
            # 64 log-spaced sub-bands -> 64 sign-of-difference bits
            lo, hi = 1, len(power)
            ledges = np.unique(np.geomspace(lo, hi, 66).astype(int))
            sub = np.add.reduceat(power[lo:],
                                  ledges[:-1] - lo)[:65]
            bits = 0
            for i in range(min(64, len(sub) - 1)):
                bits = (bits << 1) | (1 if sub[i + 1] > sub[i] else 0)
            # two's complement into a signed 64-bit long; subtracting
            # 2**64 (not 2**63!) keeps the mapping a bijection — the
            # wrong constant folds two distinct bit patterns onto one
            # long and corrupts downstream Hamming distances
            fp = bits - (1 << 64) if bits >= (1 << 63) else bits
            return (rate, centroid, dom, be, fp)

        for pdf in batches:
            cols = {k: [] for k in ("sample_rate", "spectral_centroid_hz",
                                    "dominant_band", "band_energy",
                                    "fingerprint", "decode_error")}
            for raw in pdf["payload"]:
                try:
                    rate, cen, dom, be, fp = decode(
                        bytes(raw) if raw is not None else b"")
                    vals = (rate, cen, dom, be, fp, None)
                except Exception as ex:  # quarantine, don't kill
                    vals = (None, None, None, None, None,
                            f"{type(ex).__name__}: {ex}")
                for k, v in zip(cols, vals):
                    cols[k].append(v)
            yield pd.DataFrame({"media_id": pdf["media_id"], **cols})

    return media.mapInPandas(featurize, schema=SPECTRAL_SCHEMA)


_Y4M_FRAME_FACTOR = {
    # colorspace tag -> bytes per frame as a multiple of w*h (num, den)
    "420": (3, 2), "420jpeg": (3, 2), "420mpeg2": (3, 2),
    "420paldv": (3, 2), "422": (2, 1), "444": (3, 1), "mono": (1, 1),
}


def _parse_y4m_header(b: bytes):
    """Header half of the Y4M parse, shared by ``_decode_y4m`` and
    the vectorized frame-mean fast path in ``extract_video_features``:
    returns (w, h, fps_num, fps_den, colorspace, frame_len,
    first-frame offset). Raises the same errors the combined parser
    always did."""
    nl = b.find(b"\n")
    if not b.startswith(b"YUV4MPEG2") or nl < 0:
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = 0
    fps_num, fps_den = 30, 1
    cs = "420jpeg"
    for tok in b[9:nl].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"F":
            num, _, den = val.partition(b":")
            fps_num, fps_den = int(num), int(den or b"1")
        elif tag == b"C":
            cs = val.decode("ascii", "replace")
    if width <= 0 or height <= 0:
        raise ValueError("missing W/H in Y4M header")
    if cs not in _Y4M_FRAME_FACTOR:
        raise ValueError(f"unsupported colorspace C{cs}")
    if fps_num <= 0 or fps_den <= 0:
        raise ValueError("invalid frame rate")
    fnum, fden = _Y4M_FRAME_FACTOR[cs]
    frame_len = width * height * fnum // fden
    return width, height, fps_num, fps_den, cs, frame_len, nl + 1


def _decode_y4m(b: bytes):
    """Parse a YUV4MPEG2 (Y4M) stream with stdlib-only byte math:
    returns (width, height, fps_num, fps_den, colorspace,
    [Y plane bytes per frame]). Y4M is THE raw-video interchange
    container (mjpegtools/ffmpeg `-f yuv4mpeg`): a text header
    (`YUV4MPEG2 W.. H.. F<num>:<den> .. C<cs>`), then `FRAME\\n` +
    planar YUV per frame. Only the luma plane is retained — chroma is
    skipped by size — which is what the feature math needs. Raises on
    bad magic / missing dims / truncated frames; callers quarantine."""
    width, height, fps_num, fps_den, cs, frame_len, pos = \
        _parse_y4m_header(b)
    luma_len = width * height
    lumas = []
    while pos < len(b):
        fnl = b.find(b"\n", pos)
        if not b.startswith(b"FRAME", pos) or fnl < 0:
            raise ValueError("malformed FRAME marker")
        start = fnl + 1
        if start + frame_len > len(b):
            raise ValueError("truncated frame payload")
        lumas.append(b[start:start + luma_len])
        pos = start + frame_len
    return width, height, fps_num, fps_den, cs, lumas


VIDEO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.LongType(), True),
    T.StructField("fps", T.DoubleType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
    T.StructField("frame_lumas", T.ArrayType(T.DoubleType()), True),
    T.StructField("scene_changes", T.LongType(), True),
    T.StructField("fingerprint", T.LongType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def extract_video_features(media: DataFrame, scene_threshold: float = 16.0,
                           max_lumas: int = 16) -> DataFrame:
    """REAL video decode on the media seam: Y4M payloads are parsed
    byte-exactly (``_decode_y4m``, stdlib only — no codec dependency,
    so this path runs and is tested everywhere) inside the same
    Arrow-batched ``mapInPandas`` shape as the image/audio paths.
    Emits dimensions, frame count, fps, exact duration, overall and
    per-frame mean luma (first ``max_lumas`` frames), a scene-change
    count (adjacent frames whose mean luma jumps by more than
    ``scene_threshold`` — the classic shot-boundary heuristic), and a
    64-bit temporal fingerprint (sign-of-difference bits over the
    frame-luma sequence, the video analogue of the audio
    Haitsma-Kalker scheme: near-identical clips land on
    near-identical bit patterns, so Hamming matching feeds the same
    dedup machinery text SimHash does). Corrupt payloads quarantine
    with ``decode_error`` — at 100 TB a bad object must not kill the
    stage. Compressed codecs (H.264 etc.) stay a documented seam;
    transcode to Y4M upstream (ffmpeg -f yuv4mpeg)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        mark = np.frombuffer(b"FRAME\n", dtype=np.uint8)

        def decode(b: bytes):
            # vectorized frame walk (guide §4.2): when every frame is
            # exactly b"FRAME\n" + payload (no per-frame parameters —
            # the overwhelmingly common layout) the frames lie at a
            # fixed stride, so one reshaped view checks every marker
            # and sums every luma plane without materializing
            # per-frame byte objects. The int64 sums are exact and
            # the single float division per frame is the operation
            # the per-byte Python loop performed — means are
            # bit-identical. Any other layout (frame parameters,
            # truncation, corruption) falls back to the exact
            # per-frame walk in _decode_y4m, preserving its errors.
            w, h, num, den, _cs, frame_len, pos = _parse_y4m_header(b)
            luma_len = w * h
            step, nbody = 6 + frame_len, len(b) - pos
            means = None
            if nbody == 0:
                means = []
            elif nbody > 0 and nbody % step == 0:
                arr = np.frombuffer(b, dtype=np.uint8, count=nbody,
                                    offset=pos).reshape(-1, step)
                if (arr[:, :6] == mark).all():
                    means = (arr[:, 6:6 + luma_len]
                             .sum(axis=1, dtype=np.int64)
                             / luma_len).tolist()
            if means is None:
                *_, lumas = _decode_y4m(b)
                if lumas:
                    la = np.frombuffer(b"".join(lumas), dtype=np.uint8) \
                        .reshape(len(lumas), -1)
                    means = (la.sum(axis=1, dtype=np.int64)
                             / la.shape[1]).tolist()
                else:
                    means = []
            nf = len(means)
            overall = sum(means) / nf if nf else 0.0
            scenes = sum(
                1 for i in range(1, nf)
                if abs(means[i] - means[i - 1]) > scene_threshold)
            bits = 0
            for i in range(1, min(nf, 65)):
                bits = (bits << 1) | (1 if means[i] > means[i - 1] else 0)
            # see audio_spectral_features: 2**64 keeps this a bijection
            fp = bits - (1 << 64) if bits >= (1 << 63) else bits
            return (w, h, nf, num / den,
                    int(nf * 1000 * den // num), overall,
                    means[:max_lumas], scenes, fp)

        for pdf in batches:
            cols = {k: [] for k in ("width", "height", "n_frames", "fps",
                                    "duration_ms", "mean_luma",
                                    "frame_lumas", "scene_changes",
                                    "fingerprint", "decode_error")}
            for raw in pdf["payload"]:
                try:
                    vals = decode(bytes(raw) if raw is not None else b"") \
                        + (None,)
                except Exception as ex:  # quarantine, don't kill
                    vals = (None,) * 9 + (f"{type(ex).__name__}: {ex}",)
                for k, v in zip(cols, vals):
                    cols[k].append(v)
            yield pd.DataFrame({"media_id": pdf["media_id"], **cols})

    return media.mapInPandas(featurize, schema=VIDEO_FEATURE_SCHEMA)


VIDEO_FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_index", T.IntegerType(), False),
    T.StructField("pts_ms", T.LongType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("luma", T.BinaryType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
])


def sample_video_frames(media: DataFrame, stride: int = 2,
                        max_frames: int = 8) -> DataFrame:
    """REAL frame sampling: decode Y4M and emit every ``stride``-th
    frame's luma plane as its own row (grayscale bitmap bytes +
    presentation timestamp), up to ``max_frames`` per clip — the
    keyframe-extraction shape a vision-pretraining pipeline feeds to
    an image encoder. Each emitted frame is itself a decodable
    image payload (w*h grayscale), so downstream image featurization
    composes directly. Undecodable payloads yield zero rows here
    (feature extraction is where quarantine reporting lives — a
    sampler emitting error rows would poison the frame schema).

    Scale note: output size is bounded at ``max_frames`` rows per
    clip by construction, and the explode happens inside mapInPandas
    so the raw payload is never shuffled — only the (much smaller)
    sampled luma planes are."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_index", "pts_ms",
                                   "width", "height", "luma",
                                   "mean_luma")}
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, num, den, _cs, lumas = _decode_y4m(
                        bytes(raw) if raw is not None else b"")
                except Exception:
                    continue  # quarantine lives in extract_video_features
                for j, idx in enumerate(range(0, len(lumas), stride)):
                    if j >= max_frames:
                        break
                    y = lumas[idx]
                    out["media_id"].append(mid)
                    out["frame_index"].append(idx)
                    out["pts_ms"].append(int(idx * 1000 * den // num))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["luma"].append(y)
                    out["mean_luma"].append(sum(y) / len(y) if y else 0.0)
            yield pd.DataFrame(out)

    return media.mapInPandas(sample, schema=VIDEO_FRAME_SCHEMA)


def _parse_pnm_header(b: bytes, magic: bytes):
    """Shared netpbm header parse (``P5``/``P6``): ASCII tokens
    ``<w> <h> <maxval>`` with ``#`` comments and any whitespace;
    returns (w, h, pixel-data offset). Only 8-bit maxval is supported
    (the overwhelmingly common case — ffmpeg/ImageMagick default)."""
    toks, pos = [], len(magic)
    while len(toks) < 3:
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos:pos + 1] == b"#":
            nl = b.find(b"\n", pos)
            if nl < 0:
                raise ValueError("unterminated PNM comment")
            pos = nl + 1
            continue
        start = pos
        while pos < len(b) and not b[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        toks.append(b[start:pos])
    pos += 1                       # single whitespace after maxval
    w, h, maxval = (int(t) for t in toks)
    if w <= 0 or h <= 0:
        raise ValueError("invalid PNM dimensions")
    if maxval != 255:
        raise ValueError(f"unsupported PNM maxval {maxval}")
    return w, h, pos


# Decompression-bomb guard (ADVICE r9): every stdlib decoder checks
# claimed dimensions against this bound BEFORE allocating pixel
# buffers or inflating compressed streams, so a ~40-byte payload
# claiming 65535x65535 raises a clean (quarantinable) ValueError
# instead of driving a ~12 GB allocation that can OOM-kill the
# executor. 64 MP ≈ 192 MB of RGB — far above any real corpus image,
# far below executor memory. Module-level and mutable on purpose
# (same knob shape as PIL.Image.MAX_IMAGE_PIXELS).
MAX_IMAGE_PIXELS = 64_000_000


def _check_pixels(w: int, h: int) -> None:
    if w * h > MAX_IMAGE_PIXELS:
        raise ValueError(
            f"image dimensions {w}x{h} exceed MAX_IMAGE_PIXELS="
            f"{MAX_IMAGE_PIXELS} — decompression-bomb guard")


def _decode_ppm(b: bytes):
    """Parse a binary P6 PPM (netpbm RGB) with stdlib-only byte math:
    returns (width, height, flat top-down RGB bytes). Raises on
    anything else; callers quarantine."""
    if not b.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) image")
    w, h, pos = _parse_pnm_header(b, b"P6")
    _check_pixels(w, h)
    need = w * h * 3
    if len(b) - pos < need:
        raise ValueError("truncated PPM pixel data")
    return w, h, b[pos:pos + need]


def _decode_pgm(b: bytes):
    """Parse a binary P5 PGM (netpbm grayscale): same header grammar
    as P6, one byte per pixel, replicated to RGB on return."""
    if not b.startswith(b"P5"):
        raise ValueError("not a binary PGM (P5) image")
    w, h, pos = _parse_pnm_header(b, b"P5")
    _check_pixels(w, h)
    need = w * h
    if len(b) - pos < need:
        raise ValueError("truncated PGM pixel data")
    out = bytearray(need * 3)
    gray = b[pos:pos + need]
    out[0::3] = gray
    out[1::3] = gray
    out[2::3] = gray
    return w, h, bytes(out)


def _encode_ppm(w: int, h: int, rgb: bytes) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + rgb


def _decode_bmp(b: bytes):
    """Parse an uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB)
    with stdlib-only byte math: returns (width, height, flat top-down
    RGB bytes). BMP stores BGR rows padded to 4 bytes, bottom-up when
    height is positive. Raises on other depths/compressions; callers
    quarantine."""
    import struct

    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP image")
    pix_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    if w <= 0 or h == 0:
        raise ValueError("invalid BMP dimensions")
    bottom_up = h > 0
    h = abs(h)
    _check_pixels(w, h)
    stride = (w * 3 + 3) // 4 * 4
    if len(b) - pix_off < stride * h:
        raise ValueError("truncated BMP pixel data")
    out = bytearray(w * h * 3)
    for row in range(h):
        src = pix_off + (h - 1 - row if bottom_up else row) * stride
        dst = row * w * 3
        line = b[src:src + w * 3]
        out[dst:dst + w * 3:3] = line[2::3]      # B G R -> R
        out[dst + 1:dst + w * 3:3] = line[1::3]  # G
        out[dst + 2:dst + w * 3:3] = line[0::3]  # B
    return w, h, bytes(out)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type (bit depth 8): 0=gray, 2=RGB,
# 3=palette index, 4=gray+alpha, 6=RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 interlace pass geometry: (x_start, y_start, x_step, y_step),
# straight from the PNG spec (ISO/IEC 15948 §8.2).
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_unfilter(raw: bytes, pos: int, w: int, h: int, bpp: int):
    """Reverse PNG scanline filtering for one (sub-)image of h rows of
    w*bpp bytes starting at ``raw[pos]`` (each row prefixed by its
    filter-type byte). Returns (flat unfiltered bytes, new pos).
    Filter types 0-4 (None/Sub/Up/Average/Paeth) per spec §9."""
    stride = w * bpp
    out = bytearray(h * stride)
    prev = bytes(stride)
    for row in range(h):
        if pos >= len(raw):
            raise ValueError("truncated PNG pixel data")
        ftype = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        if len(line) < stride:
            raise ValueError("truncated PNG scanline")
        pos += 1 + stride
        if ftype == 1:                                   # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:                                 # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:                                 # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:                                 # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[row * stride:(row + 1) * stride] = line
        prev = line
    return bytes(out), pos


def _decode_png(b: bytes):
    """REAL stdlib-only PNG decode: chunk walk with CRC verification,
    ``zlib`` inflate of the concatenated IDAT stream, scanline
    unfiltering (all five filter types), Adam7 de-interlacing, and
    conversion to flat top-down RGB. Supports bit depth 8 with every
    color type (gray, RGB, palette, gray+alpha, RGBA — alpha dropped);
    other depths raise and callers quarantine. Returns
    (width, height, flat RGB bytes)."""
    import struct
    import zlib

    if not b.startswith(_PNG_SIG):
        raise ValueError("not a PNG image")
    pos, idat, plte = len(_PNG_SIG), bytearray(), None
    w = h = depth = ctype = interlace = None
    while pos + 12 <= len(b):
        ln, typ = struct.unpack_from(">I4s", b, pos)
        if pos + 12 + ln > len(b):
            raise ValueError("truncated PNG chunk")
        data = b[pos + 8:pos + 8 + ln]
        crc = struct.unpack_from(">I", b, pos + 8 + ln)[0]
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch ({typ!r})")
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if ctype not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {ctype}")
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace method {interlace}")
            if w <= 0 or h <= 0:
                raise ValueError("invalid PNG dimensions")
            _check_pixels(w, h)
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    bpp = _PNG_CHANNELS[ctype]
    stride = w * bpp
    # bounded inflate: the expected filtered size is known exactly from
    # the (already pixel-guarded) header, so cap the decompressor there
    # instead of trusting the stream — a bomb stream cannot expand past
    # the bound (+1 sentinel byte detects overflow as ValueError)
    if interlace == 0:
        expect_raw = h * (stride + 1)
    else:
        expect_raw = sum(
            ((h - y0 + ys - 1) // ys)
            * (((w - x0 + xs - 1) // xs) * bpp + 1)
            for x0, y0, xs, ys in _ADAM7
            if (w - x0 + xs - 1) // xs > 0 and (h - y0 + ys - 1) // ys > 0)
    dec = zlib.decompressobj()
    try:
        raw = dec.decompress(bytes(idat), expect_raw + 1)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT stream: {exc}")
    if len(raw) > expect_raw:
        raise ValueError("PNG IDAT inflates past the filtered size "
                         "implied by IHDR — corrupt or bomb stream")
    if interlace == 0:
        px, _ = _png_unfilter(raw, 0, w, h, bpp)
    else:                                    # Adam7: 7 filtered passes
        px = bytearray(h * stride)
        rpos = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue
            sub, rpos = _png_unfilter(raw, rpos, pw, ph, bpp)
            for ry in range(ph):
                for rx in range(pw):
                    src = (ry * pw + rx) * bpp
                    dst = ((y0 + ry * ys) * w + (x0 + rx * xs)) * bpp
                    px[dst:dst + bpp] = sub[src:src + bpp]
        px = bytes(px)
    # -> flat RGB (alpha dropped, palette expanded, gray replicated)
    if ctype == 2:
        return w, h, px
    out = bytearray(w * h * 3)
    if ctype == 0:
        out[0::3] = px
        out[1::3] = px
        out[2::3] = px
    elif ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        for i, idx in enumerate(px):
            off = idx * 3
            if off + 3 > len(plte):
                raise ValueError("PNG palette index out of range")
            out[i * 3:i * 3 + 3] = plte[off:off + 3]
    elif ctype == 4:
        out[0::3] = px[0::2]
        out[1::3] = px[0::2]
        out[2::3] = px[0::2]
    else:                                    # 6: RGBA
        out[0::3] = px[0::4]
        out[1::3] = px[1::4]
        out[2::3] = px[2::4]
    return w, h, bytes(out)


def _encode_png(w: int, h: int, rgb: bytes, row_filter=None) -> bytes:
    """Minimal stdlib PNG encoder (8-bit RGB, color type 2): applies
    per-row filtering (``row_filter(row) -> 0..4``, default all-zero),
    deflates with ``zlib``, CRCs every chunk. Exists so the decode path
    has a dependency-free round-trip partner and so catalog entries can
    mint real compressed payloads that exercise every filter type."""
    import struct
    import zlib

    stride = w * 3
    if len(rgb) != h * stride:
        raise ValueError("rgb length does not match dimensions")
    lines = bytearray()
    prev = bytes(stride)
    for row in range(h):
        cur = rgb[row * stride:(row + 1) * stride]
        ft = row_filter(row) if row_filter is not None else 0
        lines.append(ft)
        if ft == 0:
            lines += cur
        elif ft == 1:
            lines += bytes((cur[i] - (cur[i - 3] if i >= 3 else 0)) & 0xFF
                           for i in range(stride))
        elif ft == 2:
            lines += bytes((cur[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:
            lines += bytes(
                (cur[i] - (((cur[i - 3] if i >= 3 else 0) + prev[i]) >> 1))
                & 0xFF for i in range(stride))
        elif ft == 4:
            lines += bytes(
                (cur[i] - _paeth(cur[i - 3] if i >= 3 else 0, prev[i],
                                 prev[i - 3] if i >= 3 else 0)) & 0xFF
                for i in range(stride))
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines)))
            + chunk(b"IEND", b""))


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW decompression (GIF89a spec appendix F): variable
    code width starting at min_code_size+1, clear/EOI codes, dictionary
    capped at 4096 entries, LSB-first bit packing across the
    concatenated sub-block payload."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = bitcnt = 0
    pos = 0

    def reset():
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return table, min_code_size + 1

    table, width = reset()
    prev = None
    while len(out) < n_pixels:
        while bitcnt < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            bitbuf |= data[pos] << bitcnt
            bitcnt += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("invalid first GIF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):            # the KwKwK case
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW code")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out[:n_pixels])


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW compression (the encoder twin of
    ``_gif_lzw_decode``): emits a clear code up front, grows the code
    width as the dictionary fills, re-clears at 4096 entries, packs
    codes LSB-first. Used by ``_encode_gif`` to mint real compressed
    payloads for tests and catalog fixtures."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code: int):
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    emit(clear)
    cur = b""
    for v in indices:
        nxt = cur + bytes([v])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            # decoder grows width when ITS table reaches 2**width;
            # its table trails ours by one (it learns each entry one
            # code late), hence the -1 here
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([v])
    if cur:
        emit(table[cur])
    emit(eoi)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _encode_gif(w: int, h: int, indices: bytes, palette: bytes,
                interlace: bool = False, min_code_size: int = 8) -> bytes:
    """Minimal stdlib GIF89a encoder: global color table, one image
    block, LZW-compressed via ``_gif_lzw_encode``, optional 4-pass
    interlacing. ``indices`` are top-down row-major palette indices;
    ``palette`` is flat RGB triples (padded to a power-of-two size as
    the format requires)."""
    import struct

    if len(indices) != w * h:
        raise ValueError("indices length does not match dimensions")
    n = len(palette) // 3
    if n < 2 or n > 256 or len(palette) % 3:
        raise ValueError("palette must be 2..256 RGB triples")
    size_field = max(0, (n - 1).bit_length() - 1)
    gct = palette + b"\x00" * (3 * ((2 << size_field) - n))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | size_field, 0, 0])
    out += gct
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0])
    if interlace:
        rows = bytearray()
        for y0, ys in _GIF_INTERLACE:
            for y in range(y0, h, ys):
                rows += indices[y * w:(y + 1) * w]
        indices = bytes(rows)
    data = _gif_lzw_encode(indices, min_code_size)
    out.append(min_code_size)
    for i in range(0, len(data), 255):
        block = data[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


# GIF interlace pass order: (y_start, y_step) per GIF89a spec §20
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif(b: bytes):
    """REAL stdlib-only GIF decode (87a/89a): logical screen descriptor,
    global/local color tables, extension-block skipping, pure-Python
    LZW decompression of the first image, 4-pass de-interlacing.
    Returns (width, height, flat top-down RGB bytes) of the first
    frame; later frames are ignored (frame selection is the video
    seam's job). Raises on corrupt streams; callers quarantine."""
    import struct

    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF image")
    if len(b) < 13:
        raise ValueError("truncated GIF header")
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = b[pos:pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n
    while pos < len(b):
        blk = b[pos]
        pos += 1
        if blk == 0x3B:                      # trailer
            break
        if blk == 0x21:                      # extension: label + subblocks
            pos += 1
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if blk != 0x2C:
            raise ValueError(f"unknown GIF block 0x{blk:02x}")
        if pos + 9 > len(b):
            raise ValueError("truncated GIF image descriptor")
        _, _, w, h = struct.unpack_from("<HHHH", b, pos)
        ipacked = b[pos + 8]
        pos += 9
        if w <= 0 or h <= 0:
            raise ValueError("invalid GIF dimensions")
        _check_pixels(w, h)
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = b[pos:pos + 3 * n]
            if len(table) < 3 * n:
                raise ValueError("truncated GIF local color table")
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image has no color table")
        if pos >= len(b):
            raise ValueError("truncated GIF image data")
        min_code = b[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"invalid GIF LZW min code size {min_code}")
        data = bytearray()
        while pos < len(b) and b[pos] != 0:
            ln = b[pos]
            data += b[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        idx = _gif_lzw_decode(bytes(data), min_code, w * h)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data underflow")
        if ipacked & 0x40:                   # de-interlace
            ordered = bytearray(w * h)
            src_row = 0
            for y0, ys in _GIF_INTERLACE:
                for y in range(y0, h, ys):
                    ordered[y * w:(y + 1) * w] = \
                        idx[src_row * w:(src_row + 1) * w]
                    src_row += 1
            idx = bytes(ordered)
        out = bytearray(w * h * 3)
        for i, v in enumerate(idx):
            off = v * 3
            if off + 3 > len(table):
                raise ValueError("GIF palette index out of range")
            out[i * 3:i * 3 + 3] = table[off:off + 3]
        return w, h, bytes(out)
    raise ValueError("GIF contains no image block")


def _packbits_decode(data: bytes, expect: int) -> bytes:
    """PackBits RLE (TIFF spec §9): n in 0..127 -> copy n+1 literal
    bytes; n in -127..-1 (two's complement) -> repeat the next byte
    1-n times; -128 is a no-op."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expect:
        n = data[pos]
        pos += 1
        if n < 128:
            out += data[pos:pos + n + 1]
            pos += n + 1
        elif n > 128:
            if pos >= len(data):
                raise ValueError("truncated PackBits run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    if len(out) < expect:
        raise ValueError("PackBits underflow")
    return bytes(out[:expect])


def _tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF-variant LZW (TIFF spec §13): like GIF's but MSB-first bit
    packing and EarlyChange code-width bumps (width grows one code
    EARLIER than GIF — at table size 2**w - 1)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = bitcnt = 0
    pos = 0

    def reset():
        return [bytes([i]) for i in range(256)] + [b"", b""], 9

    table, width = reset()
    prev = None
    while len(out) < expect:
        while bitcnt < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            bitbuf = (bitbuf << 8) | data[pos]
            bitcnt += 8
            pos += 1
        code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
        bitcnt -= width
        if code == CLEAR:
            table, width = reset()
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("invalid first TIFF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW code")
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:  # EarlyChange
            width += 1
    if len(out) < expect:
        raise ValueError("TIFF LZW underflow")
    return bytes(out[:expect])


def _decode_tiff(b: bytes):
    """Stdlib-only baseline TIFF decode: II/MM byte orders, first IFD,
    8-bit gray / RGB / RGBA (alpha dropped) / palette images, strip
    layout, Compression 1 (none), 32773 (PackBits) and 5 (TIFF LZW,
    with horizontal differencing Predictor 2). Other depths,
    tile layout, and JPEG-in-TIFF raise; callers quarantine. Returns
    (width, height, flat top-down RGB bytes)."""
    import struct

    if len(b) < 8 or b[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF image")
    end = "<" if b[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(end + "HI", b, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    if ifd_off + 2 > len(b):
        raise ValueError("truncated TIFF IFD offset")
    (n_entries,) = struct.unpack_from(end + "H", b, ifd_off)
    if ifd_off + 2 + 12 * n_entries > len(b):
        raise ValueError("truncated TIFF IFD")
    _SIZES = {1: 1, 2: 1, 3: 2, 4: 4}
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        tag, typ, count = struct.unpack_from(
            end + "HHI", b, ifd_off + 2 + 12 * i)
        voff = ifd_off + 2 + 12 * i + 8
        if typ not in _SIZES:
            continue                         # rational/etc: not needed
        size = _SIZES[typ] * count
        if size > 4:
            (voff,) = struct.unpack_from(end + "I", b, voff)
        if voff + size > len(b):
            raise ValueError("truncated TIFF tag value")
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack_from(end + str(count) + fmt,
                                            b, voff))
    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    if w <= 0 or h <= 0:
        raise ValueError("invalid TIFF dimensions")
    _check_pixels(w, h)
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8])
    if any(x != 8 for x in bits):
        raise ValueError(f"unsupported TIFF bit depths {bits}")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF unsupported (strip layout only)")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip offsets/counts")
    rows_per_strip = one(278, h)
    predictor = one(317, 1)
    stride = w * spp
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(b):
            raise ValueError("truncated TIFF strip")
        strip = b[off:off + cnt]
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        expect = n_rows * stride
        if comp == 1:
            if len(strip) < expect:
                raise ValueError("TIFF strip underflow")
            raw += strip[:expect]
        elif comp == 32773:
            raw += _packbits_decode(strip, expect)
        elif comp == 5:
            raw += _tiff_lzw_decode(strip, expect)
        else:
            raise ValueError(f"unsupported TIFF compression {comp}")
    if predictor == 2:                       # horizontal differencing
        raw = bytearray(raw)
        for row in range(h):
            base = row * stride
            for i in range(spp, stride):
                raw[base + i] = (raw[base + i] + raw[base + i - spp]) \
                    & 0xFF
        raw = bytes(raw)
    elif predictor != 1:
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    out = bytearray(w * h * 3)
    if photo in (0, 1) and spp == 1:         # grayscale
        inv = photo == 0                     # WhiteIsZero
        for i, v in enumerate(raw[:w * h]):
            g = 255 - v if inv else v
            out[i * 3:i * 3 + 3] = bytes([g, g, g])
    elif photo == 2 and spp in (3, 4):       # RGB / RGBA
        for i in range(w * h):
            out[i * 3:i * 3 + 3] = raw[i * spp:i * spp + 3]
    elif photo == 3 and spp == 1:            # palette
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("palette TIFF missing ColorMap")
        for i, v in enumerate(raw[:w * h]):
            # ColorMap is 16-bit per channel, R plane then G then B
            out[i * 3] = cmap[v] >> 8
            out[i * 3 + 1] = cmap[256 + v] >> 8
            out[i * 3 + 2] = cmap[512 + v] >> 8
    else:
        raise ValueError(
            f"unsupported TIFF photometric {photo} / {spp} samples")
    return w, h, bytes(out)


def _encode_tiff(w: int, h: int, rgb: bytes, compression: int = 1,
                 big_endian: bool = False,
                 rows_per_strip: int | None = None) -> bytes:
    """Minimal stdlib TIFF encoder (8-bit RGB, strip layout, Compression
    1 or 32773/PackBits) in either byte order — the round-trip partner
    for tests and fixture minting."""
    import struct

    end = ">" if big_endian else "<"
    stride = w * 3
    if len(rgb) != h * stride:
        raise ValueError("rgb length does not match dimensions")
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        chunk = rgb[y0 * stride:(y0 + min(rps, h - y0)) * stride]
        if compression == 32773:
            # naive PackBits: literal runs of <=128 bytes
            enc = bytearray()
            for i in range(0, len(chunk), 128):
                lit = chunk[i:i + 128]
                enc.append(len(lit) - 1)
                enc += lit
            strips.append(bytes(enc))
        elif compression == 1:
            strips.append(chunk)
        else:
            raise ValueError("encoder supports compression 1/32773 only")
    n = len(strips)

    entries = []                             # (tag, type, count, value(s))
    def tag(t, typ, vals):
        entries.append((t, typ, vals))

    tag(256, 4, [w])
    tag(257, 4, [h])
    tag(258, 3, [8, 8, 8])
    tag(259, 3, [compression])
    tag(262, 3, [2])
    tag(277, 3, [3])
    tag(278, 4, [rps])
    # offsets/counts filled after layout
    header = 8
    ifd_size = 2 + 12 * (len(entries) + 2) + 4
    extra = bytearray()
    extra_base = header + ifd_size

    def materialize(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        size = {3: 2, 4: 4}[typ] * len(vals)
        data = struct.pack(end + str(len(vals)) + fmt, *vals)
        if size <= 4:
            return data + b"\x00" * (4 - size)
        off = extra_base + len(extra)
        extra.extend(data)
        return struct.pack(end + "I", off)

    # strip data lands after the extra values; compute offsets in two
    # passes (extra grows as we materialize out-of-line values)
    pre = []
    for t, typ, vals in entries:
        pre.append((t, typ, len(vals), materialize(typ, vals)))
    counts = [len(s) for s in strips]
    off_field = materialize(4, [0] * n)      # placeholder
    cnt_field = materialize(4, counts)
    data_base = extra_base + len(extra)
    offs = []
    acc = data_base
    for c in counts:
        offs.append(acc)
        acc += c
    off_data = struct.pack(end + str(n) + "I", *offs)
    if n * 4 <= 4:
        off_field = off_data + b"\x00" * (4 - n * 4)
    else:
        (ptr,) = struct.unpack(end + "I", off_field)
        extra[ptr - extra_base:ptr - extra_base + n * 4] = off_data
    pre.append((273, 4, n, off_field))
    pre.append((279, 4, n, cnt_field))
    pre.sort(key=lambda e: e[0])
    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(end + "HI", 42, 8)
    out += struct.pack(end + "H", len(pre))
    for t, typ, cnt, field in pre:
        out += struct.pack(end + "HHI", t, typ, cnt) + field
    out += struct.pack(end + "I", 0)         # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def _decode_image_stdlib(b: bytes):
    """Format dispatch for the stdlib-only image decoders — the same
    role Y4M plays for video and ``wave`` for audio: real,
    dependency-free decode paths that execute everywhere. PPM P6 and
    24-bit BMP are raw byte math; PNG rides stdlib ``zlib`` (inflate +
    unfilter + de-interlace); GIF is pure-Python LZW; baseline JPEG is
    a pure-Python Huffman + IDCT pipeline covering BOTH baseline and
    progressive/SOF2 streams (``operators.jpegcodec``; arithmetic/
    lossless/12-bit raise and quarantine); TIFF covers strip-layout
    uncompressed / PackBits / TIFF-LZW. Nothing image-shaped is
    Pillow-gated anymore.

    Error contract (ADVICE r9): EVERY malformed input raises
    ``ValueError`` — a recognized-but-truncated container that dies
    inside ``struct.unpack_from`` (struct.error) or byte indexing
    (IndexError) is normalized here, so callers' quarantine paths and
    the Pillow fallback in ``_decode_image_any`` need to catch exactly
    one exception type."""
    import struct as _struct

    try:
        if b.startswith(b"P6"):
            return _decode_ppm(b)
        if b.startswith(b"P5"):
            return _decode_pgm(b)
        if b.startswith(b"BM"):
            return _decode_bmp(b)
        if b.startswith(_PNG_SIG):
            return _decode_png(b)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            return _decode_gif(b)
        if b.startswith(b"\xFF\xD8"):
            from cdc_data_pipeline_spark.operators.jpegcodec import \
                decode_jpeg

            return decode_jpeg(b)
        if b[:2] in (b"II", b"MM") and len(b) >= 4 \
                and b[2:4] in (b"\x2a\x00", b"\x00\x2a"):
            return _decode_tiff(b)
    except ValueError:
        raise
    except (_struct.error, IndexError, KeyError, OverflowError) as exc:
        raise ValueError(
            f"malformed image container ({type(exc).__name__}: {exc})")
    raise ValueError(
        "not a stdlib-decodable image (PPM P6 / 24-bit BMP / PNG / GIF "
        "/ baseline JPEG / TIFF)")


def _bilinear_gray(gray, w: int, h: int, tw: int, th: int):
    """REAL bilinear resample of a row-major grayscale plane (list of
    doubles) to (tw, th), half-pixel-centered with edge clamping.
    The two-stage lerp below is EXACTLY mirrored by the DuckDB oracle
    SQL (catalog/ext.py image entries) — identical operation order, so
    IEEE doubles agree bit-for-bit across engines. Vectorized (r13,
    guide §4.2): every output element is independent and each
    elementwise expression keeps the original per-element operation
    order, so results are bit-identical to the per-pixel loop this
    replaces (int() truncation == int64 cast for the non-negative
    source coordinates). Small targets (the 8x8 aHash plane) keep the
    scalar loop — numpy setup costs more than 64 lerps; measured at
    bench scale."""
    import numpy as np

    if tw * th < 1024:
        out = []
        for ty in range(th):
            sy = max(0.0, (ty + 0.5) * h / th - 0.5)
            y0 = min(int(sy), h - 1)
            y1 = min(y0 + 1, h - 1)
            fy = sy - y0
            for tx in range(tw):
                sx = max(0.0, (tx + 0.5) * w / tw - 0.5)
                x0 = min(int(sx), w - 1)
                x1 = min(x0 + 1, w - 1)
                fx = sx - x0
                top = gray[y0 * w + x0] * (1 - fx) \
                    + gray[y0 * w + x1] * fx
                bot = gray[y1 * w + x0] * (1 - fx) \
                    + gray[y1 * w + x1] * fx
                out.append(top * (1 - fy) + bot * fy)
        return out
    g = np.asarray(gray, dtype=np.float64).reshape(h, w)
    sy = np.maximum(0.0, (np.arange(th, dtype=np.float64) + 0.5)
                    * h / th - 0.5)
    y0 = np.minimum(sy.astype(np.int64), h - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fy = sy - y0
    sx = np.maximum(0.0, (np.arange(tw, dtype=np.float64) + 0.5)
                    * w / tw - 0.5)
    x0 = np.minimum(sx.astype(np.int64), w - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fx = sx - x0
    top = g[y0[:, None], x0[None, :]] * (1 - fx)[None, :] \
        + g[y0[:, None], x1[None, :]] * fx[None, :]
    bot = g[y1[:, None], x0[None, :]] * (1 - fx)[None, :] \
        + g[y1[:, None], x1[None, :]] * fx[None, :]
    return (top * (1 - fy)[:, None] + bot * fy[:, None]).ravel().tolist()


IMAGE_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_pixels", T.LongType(), True),
    T.StructField("mean_gray", T.DoubleType(), True),
    T.StructField("band_means", T.ArrayType(T.DoubleType()), True),
    T.StructField("ahash", T.LongType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def extract_image_features(media: DataFrame, n_bands: int = 4) -> DataFrame:
    """REAL image decode on the media seam — stdlib only, so this path
    runs and is tested everywhere (the Y4M/wave trick applied to
    images; closes the one decode that had only ever executed its
    Pillow gate). P6 PPM, uncompressed 24-bit BMP, PNG (stdlib zlib
    inflate + unfilter + Adam7) and GIF (pure-Python LZW) payloads are
    parsed byte-exactly inside the same Arrow-batched ``mapInPandas``
    shape as the other modalities. Emits dimensions, overall mean
    grayscale, ``n_bands`` horizontal-band gray means (the same band
    math as the Pillow path in ``extract_features``), and a 64-bit
    aHash perceptual fingerprint: REAL bilinear resize to 8x8
    (``_bilinear_gray``), threshold at the resized mean, MSB-first
    bit pack (two's-complement signed, like the audio/video
    fingerprints) — so image near-dup detection feeds the SAME
    pigeonhole-blocked Hamming join (``dedup.hamming_near_pairs``)
    text SimHash, audio and video use. Corrupt or unsupported payloads
    quarantine with ``decode_error`` instead of failing the stage."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def decode(b: bytes):
            # exact=True: native (Pillow) fast path for lossless
            # formats where decode is format-defined and test-pinned
            # identical; JPEG stays on the pinned stdlib codec so the
            # DuckDB-oracle hash parity is decoder-independent
            w, h, rgb = decode_image(b, exact=True)
            # vectorized per-pixel gray (guide §4.2): the channel sum
            # is exact integer math and the single /3.0 per pixel is
            # the same operation the Python loop performed — each
            # element bit-identical. The SUMMATIONS below (mean,
            # bands, aHash threshold) stay Python-sequential: their
            # float addition order is oracle-visible and numpy's
            # pairwise reduction would change it.
            g2 = (np.frombuffer(rgb, dtype=np.uint8)
                  .reshape(-1, 3).sum(axis=1, dtype=np.int64)
                  / 3.0).reshape(h, w)
            gray = g2.ravel().tolist()
            mean = sum(gray) / len(gray)
            # row sums via column-sequential adds: vectorized across
            # rows, left-to-right within a row — bit-identical to the
            # per-row Python sum() this replaces. Band rows are
            # contiguous (row*n_bands//h is monotonic), so each
            # band's total is the sequential Python sum of its
            # row-sum slice, exactly the old accumulation order.
            acc = g2[:, 0].copy()
            for j in range(1, w):
                acc += g2[:, j]
            band_of = np.minimum(np.arange(h) * n_bands // h,
                                 n_bands - 1)
            bounds = np.searchsorted(band_of, np.arange(n_bands + 1))
            band_means = []
            for i in range(n_bands):
                rows = acc[bounds[i]:bounds[i + 1]].tolist()
                band_means.append(
                    sum(rows, 0.0) / (len(rows) * w) if rows else 0.0)
            small = _bilinear_gray(gray, w, h, 8, 8)
            thresh = sum(small) / 64.0
            bits = 0
            for v in small:
                bits = (bits << 1) | (1 if v > thresh else 0)
            # signed 64-bit pack: subtract 2**64 (bijection), same as
            # the audio/video fingerprints
            ahash = bits - (1 << 64) if bits >= (1 << 63) else bits
            return (w, h, w * h, mean, band_means, ahash)

        for pdf in batches:
            cols = {k: [] for k in ("width", "height", "n_pixels",
                                    "mean_gray", "band_means", "ahash",
                                    "decode_error")}
            for raw in pdf["payload"]:
                try:
                    vals = decode(bytes(raw) if raw is not None else b"") \
                        + (None,)
                except Exception as ex:  # quarantine, don't kill
                    vals = (None,) * 6 + (f"{type(ex).__name__}: {ex}",)
                for k, v in zip(cols, vals):
                    cols[k].append(v)
            yield pd.DataFrame({"media_id": pdf["media_id"], **cols})

    return media.mapInPandas(featurize, schema=IMAGE_FEATURE_SCHEMA)


RESIZED_IMAGE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("decode_error", T.StringType(), True),
])


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize, stdlib only: PPM/BMP/PNG/GIF payloads
    decode, each RGB channel bilinear-resamples to (width, height)
    (``_bilinear_gray`` on the channel plane — half-pixel-centered,
    edge-clamped), and the result re-encodes as a P6 PPM (itself
    decodable by ``extract_image_features``, so resize -> featurize
    composes). Values round half-up and clamp to [0, 255].
    Undecodable payloads quarantine with ``decode_error`` and a null
    payload. JPEG stays on the Pillow-gated ``resize``."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes):
            w, h, rgb = decode_image(b, exact=True)
            planes = []
            for c in range(3):
                plane = [float(v) for v in rgb[c::3]]
                planes.append(_bilinear_gray(plane, w, h, width, height))
            out = bytearray(width * height * 3)
            for c in range(3):
                vals = planes[c]
                for i, v in enumerate(vals):
                    out[i * 3 + c] = min(255, max(0, int(v + 0.5)))
            return _encode_ppm(width, height, bytes(out))

        for pdf in batches:
            payloads, errs = [], []
            for raw in pdf["payload"]:
                try:
                    payloads.append(one(bytes(raw) if raw is not None
                                        else b""))
                    errs.append(None)
                except Exception as ex:
                    payloads.append(None)
                    errs.append(f"{type(ex).__name__}: {ex}")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": payloads,
                "width": width,
                "height": height,
                "decode_error": errs,
            })

    return media.mapInPandas(do_resize, schema=RESIZED_IMAGE_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", MEDIA_SCHEMA["meta"].dataType, True),
])


def resize(media: DataFrame, width: int, height: int, decode_stub: bool = True) -> DataFrame:
    """Resize plumbing via mapInPandas: same media schema out, metadata
    updated to the target dims. The stub "resampler" truncates/repeats
    payload bytes to width*height deterministically; with
    ``decode_stub=False`` the payload is REALLY decoded
    (``_decode_image_any``: stdlib codecs, optional Pillow fallback),
    bilinear-resized per channel (``_bilinear_gray``), and re-encoded
    as PNG via the stdlib encoder (mime updated accordingly) —
    signature, schema, and Arrow batch shape stay identical either
    way, and no external dependency is required.
    """
    target = width * height

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            metas = []
            for raw, meta in zip(pdf["payload"], pdf["meta"]):
                b = bytes(raw) if raw is not None else b""
                m = dict(meta) if meta is not None else {}
                if decode_stub:
                    out = (b * (target // max(len(b), 1) + 1))[:target] \
                        if b else b"\x00" * target
                else:
                    w, h, rgb = _decode_image_any(b)
                    small = bytearray(width * height * 3)
                    for c in range(3):
                        plane = _bilinear_gray(
                            [float(v) for v in rgb[c::3]],
                            w, h, width, height)
                        for i, v in enumerate(plane):
                            small[i * 3 + c] = min(255, max(0, int(v + 0.5)))
                    out = _encode_png(width, height, bytes(small))
                    m["mime"] = "image/png"
                payloads.append(out)
                m["width"], m["height"] = width, height
                metas.append(m)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": payloads,
                "meta": metas,
            })

    return media.mapInPandas(do_resize, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """"Frame sampling" plumbing: emit every Nth byte-offset slice of the
    payload as a row (stand-in for video frame extraction). Native
    posexplode over a computed offsets array — no UDF."""
    offsets = F.slice(
        F.sequence(F.lit(0), F.greatest(F.length(F.col("payload")) - 1, F.lit(0)), F.lit(every_n_bytes)),
        1, max_frames,
    )
    return media.select(
        "media_id",
        F.posexplode(offsets).alias("frame_index", "byte_offset"),
    )
