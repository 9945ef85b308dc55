"""Per-stage timing breakdown of the 1080p TPU encode path.

Times, per frame: H2D upload, fused pixel kernel (device), wire head D2H,
body D2H, host entropy (tokenize+pack+header).  Run on the real TPU.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    from bench import synth_1080p
    from vp8oclenc_tpu.config import EncoderConfig
    from vp8oclenc_tpu.pipeline.encoder import Encoder

    n = 9
    frames = synth_1080p(n)
    cfg = EncoderConfig(qi_min=12, qi_max=40, gop_size=1000, altref_range=5)
    enc = Encoder(cfg, 1920, 1080, backend="tpu")

    # frame 0: key; 1-2 warm inter
    for t in range(3):
        enc.encode_frame(frames[t])

    for t in range(3, n):
        f = frames[t]
        t0 = time.monotonic()
        fd, seg = enc._frame_pixels(f)
        # _frame_pixels returns as soon as kernels are dispatched; block now
        combined, bucket, body, levels_pack, modes4 = fd.device_outputs
        t1 = time.monotonic()
        jax.block_until_ready(levels_pack)
        jax.block_until_ready(enc.tpu.last[0])
        t2 = time.monotonic()
        np.asarray(combined)        # includes the head's D2H tunnel transfer
        t3 = time.monotonic()
        enc._finalize_fd(fd, seg)
        t4 = time.monotonic()
        payload = enc._finish_frame(fd, seg)
        t5 = time.monotonic()
        print(f"frame {t}: dispatch={1e3*(t1-t0):7.1f}ms "
              f"device={1e3*(t2-t1):7.1f}ms headD2H={1e3*(t3-t2):7.1f}ms "
              f"bodyD2H+unpack={1e3*(t4-t3):7.1f}ms entropy={1e3*(t5-t4):7.1f}ms "
              f"total={1e3*(t5-t0):7.1f}ms bytes={len(payload)}")


if __name__ == "__main__":
    main()
