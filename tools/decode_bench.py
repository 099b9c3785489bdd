"""Image decode throughput: stdlib codecs vs the native (Pillow)
engine — the measurement behind the round-10 dispatch inversion
(VERDICT r9 #2: `multimodal.PREFER_NATIVE_DECODER`).

Mints a fixed corpus of synthetic images with the repo's own encoders
(PNG / baseline JPEG / GIF / TIFF — one deterministic pseudo-random
RGB image per size), then times `_decode_image_stdlib` and
`_decode_image_native` over it. Prints ONE JSON line:

    {"corpus": N, "px_per_image": P,
     "stdlib": {"png_ips": ..., "jpeg_ips": ...},
     "native": {...} | null}

`native` is null when Pillow is not installed (this container) — the
stdlib numbers still pin the guaranteed-fallback cost, and the same
script run on a Pillow host fills in the comparison.

Usage: python tools/decode_bench.py [side_px] [n_images]
"""

from __future__ import annotations

import json
import random
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cdc_data_pipeline_spark.operators import multimodal as mm
from cdc_data_pipeline_spark.operators.jpegcodec import (
    encode_jpeg, encode_jpeg_progressive)


def _corpus(side: int, n: int):
    rng = random.Random(42)
    gray_pal = b"".join(bytes([i, i, i]) for i in range(256))
    out = {"png": [], "jpeg": [], "jpeg_prog": [], "gif": [],
           "tiff": []}
    for _ in range(n):
        rgb = bytes(rng.randrange(256) for _ in range(side * side * 3))
        idx = bytes(rng.randrange(256) for _ in range(side * side))
        out["png"].append(mm._encode_png(side, side, rgb))
        out["jpeg"].append(encode_jpeg(side, side, rgb, quality=85))
        out["jpeg_prog"].append(
            encode_jpeg_progressive(side, side, rgb, quality=85))
        out["gif"].append(mm._encode_gif(side, side, idx, gray_pal))
        out["tiff"].append(mm._encode_tiff(side, side, rgb))
    return out


def _time_engine(decode, corpus) -> dict:
    res = {}
    for fmt, payloads in corpus.items():
        t0 = time.perf_counter()
        for b in payloads:
            decode(b)
        dt = time.perf_counter() - t0
        res[f"{fmt}_ips"] = round(len(payloads) / dt, 2)
    return res


def main() -> None:
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    corpus = _corpus(side, n)
    stdlib = _time_engine(mm._decode_image_stdlib, corpus)
    try:
        import PIL  # noqa: F401

        native = _time_engine(mm._decode_image_native, corpus)
    except ImportError:
        native = None
    print(json.dumps({"corpus": n, "side_px": side,
                      "px_per_image": side * side,
                      "stdlib": stdlib, "native": native}))


if __name__ == "__main__":
    main()
