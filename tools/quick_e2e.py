"""Quick end-to-end fps probe (subset of bench.py) for iterating on the
pipeline: 2 passes x 10 frames at 1080p, link rate per pass."""
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402


def main():
    from vp8oclenc_tpu.config import EncoderConfig
    from vp8oclenc_tpu.pipeline.encoder import Encoder

    n_warm, n_meas = 3, 10
    frames = bench.synth_1080p(n_warm + n_meas)
    base = dict(qi_min=12, qi_max=40, gop_size=1000, altref_range=5,
                num_partitions=4, threads=6)
    enc = Encoder(EncoderConfig(**base), 1920, 1080, backend="tpu")
    for t in range(n_warm):
        enc.encode_frame(frames[t])

    # instrument the three loop phases
    agg = {}

    def wrap(name, fn):
        def g(*a, **k):
            t0 = time.monotonic()
            out = fn(*a, **k)
            agg[name] = agg.get(name, 0.0) + time.monotonic() - t0
            return out
        return g

    enc._frame_pixels = wrap("dispatch", enc._frame_pixels)
    enc._finalize_fd = wrap("finalize(fetch+unpack)", enc._finalize_fd)
    enc._finish_frame = wrap("finish(entropy+pack)", enc._finish_frame)
    enc._upload_frame = wrap("upload(thread)", enc._upload_frame)
    for p in range(3):
        link = bench.measure_link()
        agg.clear()
        t0 = time.monotonic()
        n = 0
        for _payload in enc.encode_frames(frames[n_warm:]):
            n += 1
        dt = time.monotonic() - t0
        parts = "  ".join(f"{k}={1e3 * v / n:.0f}" for k, v in agg.items())
        print(f"pass {p}: {n / dt:.3f} fps   link h2d/d2h = {link} MB/s "
              f"({1e3 * dt / n:.1f} ms/frame)  [{parts} ms/f]")

    # keyframe decomposition
    agg.clear()
    t0 = time.monotonic()
    enc.frames_until_key = 1
    enc.encode_frame(frames[0])
    parts = "  ".join(f"{k}={1e3 * v:.0f}" for k, v in agg.items())
    print(f"solo keyframe: {1e3 * (time.monotonic() - t0):.1f} ms  [{parts}]")


if __name__ == "__main__":
    main()
