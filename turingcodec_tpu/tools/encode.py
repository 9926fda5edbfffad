"""CLI: encode raw 4:2:0 YUV to an HEVC bitstream.

Usage: python -m turingcodec_tpu.tools.encode in.yuv --input-res WxH
           [-o out.hevc] [--qp N] [--frames N] [--dump-frames recon.yuv]

Parity reference: the `turing encode` subcommand (turing/encode.cpp).
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="turingcodec_tpu encode")
    ap.add_argument("input")
    ap.add_argument("--input-res", required=True, help="<width>x<height>")
    ap.add_argument("-o", "--output-file", required=True)
    ap.add_argument("--qp", type=int, default=26)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--bit-depth", type=int, default=8)
    ap.add_argument("--dump-frames", default=None,
                    help="write reconstructed YUV here")
    ap.add_argument("--rd-candidates", type=int, default=3)
    ap.add_argument("--no-progress", action="store_true")
    args = ap.parse_args(argv)

    import numpy as np

    from turingcodec_tpu.encode.encoder import Encoder, EncoderConfig

    w, h = (int(x) for x in args.input_res.split("x"))
    cfg = EncoderConfig(width=w, height=h, qp=args.qp,
                        bit_depth=args.bit_depth,
                        rd_candidates=args.rd_candidates)
    enc = Encoder(cfg)
    data = open(args.input, "rb").read()
    fsz = w * h * 3 // 2
    total = len(data) // fsz
    if args.frames is not None:
        total = min(total, args.frames)

    out = open(args.output_file, "wb")
    out.write(enc.headers())
    dump = open(args.dump_frames, "wb") if args.dump_frames else None
    t0 = time.time()
    nbytes = 0
    for i in range(total):
        off = i * fsz
        y = np.frombuffer(data[off:off + w * h],
                          np.uint8).reshape(h, w).astype(np.int16)
        cb = np.frombuffer(data[off + w * h:off + w * h + fsz // 6 * 1],
                           np.uint8)[: w * h // 4].reshape(h // 2, w // 2).astype(np.int16)
        cr = np.frombuffer(data[off + w * h + w * h // 4:off + fsz],
                           np.uint8).reshape(h // 2, w // 2).astype(np.int16)
        nal, recon = enc.encode_frame([y, cb, cr])
        out.write(nal)
        nbytes += len(nal)
        if dump:
            for p in recon:
                dump.write(p.astype(np.uint8).tobytes())
        if not args.no_progress:
            print(f"frame {i}: {len(nal)} bytes "
                  f"({(i + 1) / (time.time() - t0):.2f} fps)",
                  file=sys.stderr)
    out.close()
    if dump:
        dump.close()
    if not args.no_progress:
        dt = time.time() - t0
        print(f"encoded {total} frames, {nbytes} bytes, {dt:.1f}s",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
