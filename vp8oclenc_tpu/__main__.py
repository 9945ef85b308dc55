"""CLI entry point: Y4M in, IVF out (same knobs as the reference encoder)."""
from __future__ import annotations

import sys
import time

from vp8oclenc_tpu.config import build_arg_parser, config_from_args
from vp8oclenc_tpu.io.ivf import IVFWriter
from vp8oclenc_tpu.io.y4m import Y4MReader
from vp8oclenc_tpu.pipeline.encoder import Encoder


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)
    cfg = config_from_args(args)

    reader = Y4MReader(args.input)
    info = reader.info
    enc = Encoder(cfg, info.width, info.height, backend=args.backend)

    with open(args.output, "wb") as fh:
        writer = IVFWriter(fh, info.width, info.height,
                           framerate=info.framerate, timescale=1)
        total_bytes = 0
        t0 = time.monotonic()

        def frame_iter():
            for n, frame in enumerate(reader):
                if args.frames and n >= args.frames:
                    return
                yield frame

        for n, payload in enumerate(enc.encode_frames(frame_iter())):
            writer.write_frame(payload)
            total_bytes += len(payload)
            if cfg.print_info:
                fps = info.framerate
                br = total_bytes * fps * 8 // (n + 1) // 1024
                print(f"{n}> br={br}k, frame~{(len(payload) + 512) // 1024}k")
        writer.finalize()
        dt = time.monotonic() - t0
        print(f"encoded {writer.frame_count} frames in {dt:.2f}s "
              f"({writer.frame_count / max(dt, 1e-9):.2f} fps), "
              f"{total_bytes} bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
