"""Headline benchmark: 1080p frames/s on one TPU chip, end-to-end.

Encodes a synthetic 1080p sequence (keyframe + P-frames over a textured pan)
through the full TPU pipeline (device pixel kernels + host entropy/packing)
in the reference's launch configuration (-partitions 4 -threads 6, BASELINE
config 4 / launch_example:5), with and without the SSIM target.

Because the chip hangs off a remote tunnel whose ~50 MB/s link is the
end-to-end wall (3.2 MB of source per 1080p frame must cross it), the bench
reports BOTH:
  * end-to-end fps (median of N passes, with the per-pass link rate printed
    so vs_baseline is interpretable), and
  * device_fps = 1000 / device-chain-ms — the chip-side throughput a
    deployment with a real host interconnect would see (timed by
    dispatch + 1-scalar fetch minus tunnel sync; `block_until_ready`
    returns at dispatch through the tunnel and cannot time execution).

Prints exactly one JSON line:
  {"metric": "1080p_fps", "value": <median end-to-end fps>, ...}
"""
import json
import statistics
import sys
import time

import numpy as np

V5E_TFLOPS_BF16 = 394.0
N_PASSES = 4


def synth_1080p(n):
    from vp8oclenc_tpu.io.y4m import Frame
    W, H = 1920, 1080
    rng = np.random.default_rng(0)
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


def search_workload(W, H):
    """Analytic FLOP / byte counts of the per-frame motion search+DCT work
    as actually executed (Pallas phase-table formulation — candidate
    extraction recomputes overlapping pixels, and that redundancy is
    included).  MODELED traffic, used as the roofline denominator only."""
    n = (H // 8) * (W // 8)
    level_scale = sum(1.0 / 4 ** l for l in range(5))
    fullpel_mac = 2 * 3 * n * 256 * 1600 * level_scale
    qpel_mac = 3 * n * (384 * 680 + 680 * 1600 + 1600 * 1600 + 2 * 1600 * 64)
    mbc = (W // 16) * (H // 16)
    transform_mac = mbc * 25 * 16 * 16 * 4
    tflop = 2 * (fullpel_mac + qpel_mac + transform_mac) / 1e12
    gbytes = (2 * 3 * n * 384 * (1 + 0.3) + 3 * n * 384
              + 4 * W * H * 1.5) / 1e9
    return tflop, gbytes


# ---------------------------------------------------------------------------
# tunnel-safe device timing: dispatch + 1-scalar fetch - sync latency
# ---------------------------------------------------------------------------

def _touch(out):
    import jax
    return float(jax.tree_util.tree_leaves(out)[0].sum())


_SYNC = None


def sync_latency():
    global _SYNC
    if _SYNC is None:
        import jax
        import jax.numpy as jnp
        f = jax.jit(lambda a: a * 2)
        z = jnp.zeros((8, 128), jnp.float32)
        _touch(f(z))
        best = 1e9
        for _ in range(6):
            t0 = time.monotonic()
            _touch(f(z))
            best = min(best, time.monotonic() - t0)
        _SYNC = best
    return _SYNC


def devtime(fn, *args, reps=4):
    _touch(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic()
        _touch(fn(*args))
        best = min(best, time.monotonic() - t0)
    return max(best - sync_latency(), 1e-4)


def measure_link():
    """Per-pass H2D/D2H link rate through the tunnel (MB/s)."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    buf = rng.integers(0, 256, 3136 * 1024, np.uint8)
    x = jnp.asarray(buf)
    _touch(x.astype(jnp.float32))
    t0 = time.monotonic()
    x = jnp.asarray(buf)
    _touch(x.astype(jnp.float32))
    h2d = buf.nbytes / max(time.monotonic() - t0 - sync_latency(), 1e-4) / 1e6
    f = jax.jit(lambda a, k: a + k)
    y = f(x, np.uint8(1))
    _touch(y.astype(jnp.float32))
    t0 = time.monotonic()
    np.asarray(y)
    d2h = buf.nbytes / max(time.monotonic() - t0 - sync_latency(), 1e-4) / 1e6
    return round(h2d, 1), round(d2h, 1)


def device_chain_ms(enc, frames, ssim_on):
    """Device-only per-frame chain (inter pixel kernel + loop filter/ref
    state + wire pack) using the encoder's live reference state."""
    import jax.numpy as jnp
    from vp8oclenc_tpu.io.y4m import pad_frame
    from vp8oclenc_tpu.ops.inter import build_inter_kernel
    from vp8oclenc_tpu.ops.loopfilter import build_filter_from_meta_kernel
    from vp8oclenc_tpu.ops.wire import build_wire_kernel

    tpu = enc.tpu
    p = pad_frame(frames[-1])
    yuv = jnp.asarray(np.concatenate([p.y.ravel(), p.u.ravel(), p.v.ravel()]))
    ls = tpu.last_state
    kern = build_inter_kernel(tpu.wrk_w, tpu.wrk_h, ssim_enabled=ssim_on)
    fkern = build_filter_from_meta_kernel(tpu.mbw, tpu.mbh)
    wkern = build_wire_kernel(tpu.mbc)
    seg_q = jnp.asarray(np.array([8, 10, 12, 14], np.int32))
    lf = jnp.asarray(np.broadcast_to(
        np.array([20, 30, 20, 15, 2], np.int32)[:, None], (2, 5, 4)).copy()
        .reshape(2, 5, 4))

    def chain(yuv):
        out = kern.yuv(yuv, (ls[0], ls[0], ls[0]), (ls[1], ls[1], ls[1]),
                       (ls[2], ls[2], ls[2]), (ls[3], ls[3], ls[3]),
                       jnp.asarray(np.array([True, True, True])),
                       seg_q, seg_q, seg_q, seg_q, seg_q, seg_q,
                       jnp.int32(93000 if ssim_on else -1))
        levels_pack, meta, cur_ssim = out[0], out[1], out[2]
        ry, ru, rv = out[3], out[4], out[5]
        filt, _state = fkern(ry, ru, rv, levels_pack, meta, cur_ssim, lf)
        head, body, stats = wkern(levels_pack, meta, cur_ssim, out[7])
        return filt[0], head, stats

    return 1e3 * devtime(chain, yuv)


def main():
    from vp8oclenc_tpu.config import EncoderConfig
    from vp8oclenc_tpu.pipeline.encoder import Encoder

    n_warm, n_meas = 3, 10
    frames = synth_1080p(n_warm + n_meas)
    base = dict(qi_min=12, qi_max=40, gop_size=1000, altref_range=5,
                num_partitions=4, threads=6)

    def measure(e):
        """Median-of-N end-to-end passes with the per-pass link rate."""
        fps_passes, links = [], []
        for _ in range(N_PASSES):
            links.append(measure_link())
            t0 = time.monotonic()
            n = 0
            for _payload in e.encode_frames(frames[n_warm:]):
                n += 1
            fps_passes.append(round(n / (time.monotonic() - t0), 3))
        return statistics.median(fps_passes), fps_passes, links

    enc = Encoder(EncoderConfig(**base), 1920, 1080, backend="tpu")
    for t in range(n_warm):
        enc.encode_frame(frames[t])
    fps, passes, links = measure(enc)

    # keyframe latency (solo encode_frame incl. transfers)
    t0 = time.monotonic()
    enc.frames_until_key = 1
    enc.encode_frame(frames[0])
    key_ms = 1e3 * (time.monotonic() - t0)

    dev_ms_off = device_chain_ms(enc, frames, ssim_on=False)
    tflop, gbytes = search_workload(1920, 1088)

    # full-feature configuration: -SSIM-target 93 (launch_example:5)
    enc_s = Encoder(EncoderConfig(ssim_target=0.93, **base),
                    1920, 1080, backend="tpu")
    for t in range(n_warm):
        enc_s.encode_frame(frames[t])
    fps_ssim, passes_s, _links_s = measure(enc_s)
    dev_ms_on = device_chain_ms(enc_s, frames, ssim_on=True)

    dev_s = dev_ms_off / 1e3
    print(json.dumps({
        "metric": "1080p_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 4),
        "fps_ssim_target93": round(fps_ssim, 3),
        "fps_passes": passes,
        "fps_passes_ssim": passes_s,
        "link_h2d_MBps": [l[0] for l in links],
        "link_d2h_MBps": [l[1] for l in links],
        "device_chain_ms": round(dev_ms_off, 1),
        "device_chain_ms_ssim": round(dev_ms_on, 1),
        "device_fps": round(1e3 / dev_ms_off, 2),
        "device_fps_ssim": round(1e3 / dev_ms_on, 2),
        "keyframe_ms": round(key_ms, 1),
        "GBps_me_dct_modeled": round(gbytes / dev_s, 1),
        "mxu_roofline_pct": round(100.0 * tflop / dev_s / V5E_TFLOPS_BF16, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
