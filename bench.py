"""Headline benchmark: 1080p frames/s on one TPU chip, end-to-end.

Encodes a synthetic 1080p sequence (keyframe + P-frames over a textured pan)
through the full TPU pipeline (device pixel kernels + host entropy/packing)
and reports steady-state throughput.  The reference publishes no absolute
numbers (README.md:37), so the baseline is self-established per BASELINE.md:
vs_baseline is measured fps against a 30 fps real-time 1080p target.

Prints exactly one JSON line:
  {"metric": "1080p_fps", "value": N, "unit": "frames/s", "vs_baseline": N/30}
"""
import json
import sys
import time

import numpy as np


def synth_1080p(n):
    from vp8oclenc_tpu.io.y4m import Frame
    W, H = 1920, 1080
    rng = np.random.default_rng(0)
    # textured content: smooth gradients + structure + mild noise, panning
    yy, xx = np.mgrid[0:H + 64, 0:W + 64]
    base = (128 + 60 * np.sin(xx / 37.0) * np.cos(yy / 29.0)
            + 40 * np.sin((xx + yy) / 11.0))
    base = (base + rng.integers(0, 24, base.shape)).clip(0, 255).astype(np.uint8)
    frames = []
    for t in range(n):
        ox, oy = 3 * t, 2 * t
        y = np.ascontiguousarray(base[oy:oy + H, ox:ox + W])
        u = np.ascontiguousarray(base[oy // 2:oy // 2 + H // 2,
                                      ox // 2:ox // 2 + W // 2] // 2 + 60)
        v = np.ascontiguousarray(base[oy // 2 + 8:oy // 2 + 8 + H // 2,
                                      ox // 2 + 4:ox // 2 + 4 + W // 2] // 2 + 50)
        frames.append(Frame(y, u, v))
    return frames


def main():
    from vp8oclenc_tpu.config import EncoderConfig
    from vp8oclenc_tpu.pipeline.encoder import Encoder

    n_warm, n_meas = 3, 8
    frames = synth_1080p(n_warm + n_meas)
    cfg = EncoderConfig(qi_min=12, qi_max=40, gop_size=1000, altref_range=5)
    enc = Encoder(cfg, 1920, 1080, backend="tpu")

    total_bytes = 0
    for t in range(n_warm):
        total_bytes += len(enc.encode_frame(frames[t]))

    t0 = time.monotonic()
    for payload in enc.encode_frames(frames[n_warm:]):
        total_bytes += len(payload)
    dt = time.monotonic() - t0
    fps = n_meas / dt

    # keyframe latency (the intra wavefront path, warm): VERDICT.md #6/#8
    t0 = time.monotonic()
    enc.frames_until_key = 1
    enc.encode_frame(frames[0])
    key_ms = 1e3 * (time.monotonic() - t0)

    # full-feature configuration: -SSIM-target 93 (the reference
    # launch_example settings, /root/reference/launch_example:5; the CLI
    # divides the percentage by 100, config.py:config_from_args)
    enc_s = Encoder(EncoderConfig(qi_min=12, qi_max=40, gop_size=1000,
                                  altref_range=5, ssim_target=0.93),
                    1920, 1080, backend="tpu")
    for t in range(n_warm):
        enc_s.encode_frame(frames[t])
    t0 = time.monotonic()
    for payload in enc_s.encode_frames(frames[n_warm:]):
        pass
    fps_ssim = n_meas / (time.monotonic() - t0)

    print(json.dumps({
        "metric": "1080p_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 4),
        "keyframe_ms": round(key_ms, 1),
        "fps_ssim_target93": round(fps_ssim, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
