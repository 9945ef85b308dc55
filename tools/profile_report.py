"""Produce PROFILE_r{N}.json: the committed per-stage decomposition of the
1080p encode path on the real TPU, plus the tunnel characterization that
sets the end-to-end floor.

Usage: python tools/profile_report.py [round]   (default round 4)

Sections:
  tunnel    — measured sync latency and H2D/D2H bandwidth of the remote-TPU
              link.  Every block_until_ready/np.asarray after the first
              D2H pays ~sync_ms; transfers move at h2d/d2h MB/s and only
              partially overlap compute.
  device_ms — compute-only cost of each device program (standalone best-of
              timing minus the sync latency).
  frame_ms  — phase timing of the PIPELINED encode loop (what bench.py
              measures): per-frame wall and where it goes.
  roofline  — analytic FLOP/byte counts of the motion-search matmuls vs
              the chip's peak (TPU v5e: ~394 bf16 TFLOP/s, ~819 GB/s HBM).
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

W, H = 1920, 1088
V5E_TFLOPS_BF16 = 394.0
V5E_HBM_GBPS = 819.0


def best_of(fn, reps=4):
    out = fn()
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic()
        jax.block_until_ready(fn())
        best = min(best, time.monotonic() - t0)
    return 1e3 * best


def measure_tunnel():
    x = jnp.asarray(np.arange(1 << 10, dtype=np.uint8))
    f = jax.jit(lambda a: a * 2)
    jax.block_until_ready(f(x))
    np.asarray(x[:8])                      # enter sync-honest mode
    sync = best_of(lambda: f(x), reps=6)
    big = np.random.default_rng(0).integers(0, 256, (3110400,), np.uint8)
    h2d = []
    for _ in range(3):
        t0 = time.monotonic()
        jax.block_until_ready(jnp.asarray(big))
        h2d.append(time.monotonic() - t0)
    d2h = []
    for k in range(3):
        # a FRESH device array per rep: np.asarray caches the host copy on
        # the buffer, so re-reading the same array measures nothing
        bigd = jax.block_until_ready(jnp.asarray(big) + np.uint8(k))
        t0 = time.monotonic()
        np.asarray(bigd)
        d2h.append(time.monotonic() - t0)
    mb = big.nbytes / 1e6
    return dict(
        sync_latency_ms=round(sync, 1),
        h2d_MBps=round(mb / np.median(h2d), 1),
        d2h_MBps=round(mb / np.median(d2h), 1),
        note="sync latency applies to every blocking readback after the "
             "first D2H; dispatch itself is async (~0.1 ms)")


def measure_device(sync_ms):
    from vp8oclenc_tpu.ops import inter as I
    from vp8oclenc_tpu.ops.loopfilter import build_filter_from_meta_kernel
    from vp8oclenc_tpu.ops.wire import build_wire_kernel
    from vp8oclenc_tpu.ops.intra import build_intra_kernel

    mbw, mbh, mbc = W // 16, H // 16, (W // 16) * (H // 16)
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (H, W), np.uint8)
    u = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    v = rng.integers(0, 256, (H // 2, W // 2), np.uint8)

    rkern = I.build_ref_state_kernel(W, H)
    pyr, tbl, u_pad, v_pad = rkern(jnp.asarray(y), jnp.asarray(u),
                                   jnp.asarray(v))
    pyrs, tbls = (pyr,) * 3, (tbl,) * 3
    u_pads, v_pads = (u_pad,) * 3, (v_pad,) * 3
    yuv = jnp.asarray(np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
    q = jnp.asarray(np.array([8, 10, 12, 14], np.int32))

    out = {}
    for ssim_on in (False, True):
        kern = I.build_inter_kernel(W, H, ssim_enabled=ssim_on)
        args = (yuv, pyrs, tbls, u_pads, v_pads,
                jnp.asarray(np.array([True, True, True])), q, q, q, q, q, q,
                jnp.int32(88000 if ssim_on else -1))
        t = best_of(lambda: kern.yuv(*args))
        out[f"inter_kernel_ssim_{'on' if ssim_on else 'off'}"] = \
            round(t - sync_ms, 1)

    # device-resident args (re-uploading the 6.5 MB levels per rep would
    # measure the tunnel, not the kernel)
    levels = jax.block_until_ready(
        jnp.asarray(rng.integers(-6, 7, (mbc, 25, 16), np.int16)))
    meta = jax.block_until_ready(
        jnp.asarray(rng.integers(0, 2, (mbc, 11), np.int32)))
    ssim = jnp.asarray(rng.integers(0, 98304, (mbc,), np.int32))
    lf = jnp.asarray(np.tile(
        np.array([20, 30, 25, 10, 2], np.int32)[None, :, None], (2, 1, 4)))
    yd, ud, vd = (jax.block_until_ready(jnp.asarray(p)) for p in (y, u, v))
    fkern = build_filter_from_meta_kernel(mbw, mbh)
    t = best_of(lambda: fkern(yd, ud, vd, levels, meta, ssim, lf))
    out["loopfilter_plus_refstate"] = round(t - sync_ms, 1)

    wkern = build_wire_kernel(mbc)
    t = best_of(lambda: wkern(levels, meta, ssim, jnp.int32(0)))
    out["wire_pack"] = round(t - sync_ms, 1)

    ikern = build_intra_kernel(W, H)
    t = best_of(lambda: ikern(yd, ud, vd, jnp.int32(8), jnp.int32(8),
                              jnp.int32(8), jnp.int32(8)), reps=2)
    out["intra_keyframe_kernel"] = round(t - sync_ms, 1)
    return out


def measure_pipeline():
    from bench import synth_1080p
    from vp8oclenc_tpu.config import EncoderConfig
    from vp8oclenc_tpu.pipeline.encoder import Encoder

    n_warm, n_meas = 3, 10
    frames = synth_1080p(n_warm + n_meas)
    cfg = EncoderConfig(qi_min=12, qi_max=40, gop_size=1000, altref_range=5)
    enc = Encoder(cfg, 1920, 1080, backend="tpu")
    for t in range(n_warm):
        enc.encode_frame(frames[t])

    it = iter(frames[n_warm:])
    pending = None
    f = next(it, None)
    pre = enc._upload_frame(f)
    phases = dict(dispatch=0.0, upload_issue=0.0, finalize_wait=0.0,
                  entropy=0.0)
    k = 0
    tw0 = time.monotonic()
    while pre is not None:
        ta = time.monotonic()
        nxt = enc._frame_pixels(pre[0], yuv_dev=pre[1], padded=True)
        tb = time.monotonic()
        f = next(it, None)
        pre = enc._upload_frame(f) if f is not None else None
        tc = time.monotonic()
        if pending is not None:
            enc._finalize_fd(pending[0], pending[1])
            td = time.monotonic()
            enc._finish_frame(*pending)
            te = time.monotonic()
            phases["dispatch"] += tb - ta
            phases["upload_issue"] += tc - tb
            phases["finalize_wait"] += td - tc
            phases["entropy"] += te - td
            k += 1
        pending = nxt
    enc._finalize_fd(pending[0], pending[1])
    enc._finish_frame(*pending)
    wall = time.monotonic() - tw0
    out = {p: round(1e3 * s / k, 1) for p, s in phases.items()}
    out["wall_per_frame"] = round(1e3 * wall / n_meas, 1)
    out["fps"] = round(n_meas / wall, 2)
    return out


def roofline():
    n = (H // 8) * (W // 8)
    # Pallas fullpel: 2 windows x 3 refs x (384 x 1600) MACs per block, all
    # 5 levels (coarser levels have n/4^l blocks)
    level_scale = sum(1.0 / 4 ** l for l in range(5))
    fullpel_mac = 2 * 3 * n * 384 * 1600 * level_scale
    # Pallas qpel: 3 refs x (544x680 H + 680x1600 V + 25x64x64 cost + misc)
    qpel_mac = 3 * n * (544 * 680 + 680 * 1600 + 1600 * 64 + 1600 * 64)
    total_tflop = 2 * (fullpel_mac + qpel_mac) / 1e12
    ideal_ms = total_tflop / V5E_TFLOPS_BF16 * 1e3
    # HBM: patches are the dominant traffic (u8)
    gb = (2 * 3 * n * 384 * (1 + level_scale - 1) + 3 * n * 544
          + 2 * 3 * n * 384) / 1e9
    return dict(
        search_tflop_per_frame=round(total_tflop, 3),
        mxu_ideal_ms=round(ideal_ms, 2),
        hbm_patch_traffic_GB=round(gb, 3),
        hbm_ideal_ms=round(gb / V5E_HBM_GBPS * 1e3, 2),
        peak_tflops_bf16=V5E_TFLOPS_BF16,
        peak_hbm_GBps=V5E_HBM_GBPS,
        note="candidate extraction via constant matmuls recomputes "
             "overlapping pixels 25x; the MXU-ideal time already includes "
             "that redundancy")


def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else "4"
    dev = jax.devices()[0]
    report = dict(round=int(rnd), device=str(dev.device_kind),
                  resolution=f"{W}x{H}")
    print("measuring tunnel...", flush=True)
    report["tunnel"] = measure_tunnel()
    sync = report["tunnel"]["sync_latency_ms"]
    print("measuring device programs...", flush=True)
    report["device_ms"] = measure_device(sync)
    print("measuring pipelined frame loop...", flush=True)
    report["frame_ms"] = measure_pipeline()
    report["roofline"] = roofline()
    dm = report["device_ms"]
    fm = report["frame_ms"]
    report["conclusion"] = (
        f"steady-state {fm['wall_per_frame']} ms/frame = source upload "
        f"(~3.1 MB at ~{report['tunnel']['h2d_MBps']} MB/s) + device chain "
        f"(~{dm['inter_kernel_ssim_off'] + dm['loopfilter_plus_refstate'] + dm['wire_pack']:.0f} ms) "
        f"+ wire readback, serialized on the tunnel; the MXU-ideal search "
        f"time is {report['roofline']['mxu_ideal_ms']} ms — the residual "
        f"gap to real-time is transfer-bound, not compute-bound")
    path = f"PROFILE_r{rnd}.json"
    with open(path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
