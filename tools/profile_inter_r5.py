"""Stage decomposition of the fused 1080p inter device program with
tunnel-safe timing.

Through the remote (axon) tunnel `jax.block_until_ready` returns at
dispatch, not completion, so naive timings report dispatch overhead.
Each measurement here is dispatch + a 1-scalar fetch (which waits for the
program) minus the separately-measured tunnel sync latency; the method
reproduces ~200 TFLOPS on a known 4096^3 bf16 matmul chain.

Run on the TPU host:  python tools/profile_inter_r5.py [--json out.json]
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

W, H = 1920, 1088
REPS = 4


def _touch(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(leaves[0].sum())


_SYNC = None


def sync_latency():
    global _SYNC
    if _SYNC is None:
        f = jax.jit(lambda a: a * 2)
        z = jnp.zeros((8, 128), jnp.float32)
        _touch(f(z))
        best = 1e9
        for _ in range(6):
            t0 = time.monotonic()
            _touch(f(z))
            best = min(best, time.monotonic() - t0)
        _SYNC = best
        print(f"{'tunnel sync':34s} {1e3 * best:8.2f} ms")
    return _SYNC


RESULTS = {}


def timeit(name, fn, *args):
    sync = sync_latency()
    out = fn(*args)
    _touch(out)                     # warm compile + precompile the reducer
    best = 1e9
    for _ in range(REPS):
        t0 = time.monotonic()
        out = fn(*args)
        _touch(out)
        best = min(best, time.monotonic() - t0)
    est = max(best - sync, 0.0)
    RESULTS[name] = round(1e3 * est, 2)
    print(f"{name:34s} {1e3 * est:8.2f} ms")
    return out


def main():
    from vp8oclenc_tpu.ops import inter as I
    from vp8oclenc_tpu.ssim_fx import mb_ssim_fx

    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (H, W), np.uint8)
    u = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    v = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    refs = rng.integers(0, 256, (3, H, W), np.uint8)
    refs_u = rng.integers(0, 256, (3, H // 2, W // 2), np.uint8)
    refs_v = rng.integers(0, 256, (3, H // 2, W // 2), np.uint8)
    mbw, mbh, mbc = W // 16, H // 16, (W // 16) * (H // 16)

    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind)

    rkern = I.build_ref_state_kernel(W, H)
    ry, ru, rv = (jnp.asarray(refs[0]), jnp.asarray(refs_u[0]),
                  jnp.asarray(refs_v[0]))
    state = timeit("ref_state (pyramid+tables+pad)", rkern, ry, ru, rv)
    pyr, tbl, u_pad, v_pad = state
    pyrs = (pyr, pyr, pyr)
    tbls = (tbl, tbl, tbl)
    u_pads = (u_pad, u_pad, u_pad)
    v_pads = (v_pad, v_pad, v_pad)

    @jax.jit
    def cur_pyr_fn(y):
        out = [y]
        for _ in range(4):
            out.append(I.downsample2(out[-1]))
        return tuple(out)

    cur_pyr = timeit("cur pyramid", cur_pyr_fn, jnp.asarray(y))

    ref_pyr = []
    pad, h, w = I.PAD_Y_FULL, H, W
    for lvl in range(5):
        stacked = jnp.stack([pyr[lvl]] * 3)
        ref_pyr.append((stacked, (pad, pad), (h, w)))
        pad //= 2
        h //= 2
        w //= 2

    # ---- L0 search sub-stages: patch gather alone vs pallas kernel alone
    nby, nbx = H // 8, W // 8
    n = nby * nbx
    cx = jnp.tile(jnp.arange(nbx) * 8, nby)
    cy = jnp.repeat(jnp.arange(nby) * 8, nbx)
    v0 = jnp.asarray(rng.integers(-8, 8, (3, n, 2), np.int32))
    plane0, pads0, _ = ref_pyr[0]

    @jax.jit
    def build_tbl(plane):
        return I.build_phase_tables(plane)

    tbl0 = timeit("L0 phase-table build", build_tbl, plane0)
    TB0, TC0 = plane0.shape[-2] // 8, plane0.shape[-1] // 16

    @jax.jit
    def gather_l0(tbl, v0):
        ridx = jnp.broadcast_to(jnp.arange(3)[:, None], (3, n))
        zero = jnp.zeros((3, n), jnp.int32)
        r1, o1 = I.phase_gather(tbl, TB0, TC0, ridx,
                                cy[None] + v0[..., 1] + (pads0[0] - 2),
                                cx[None] + v0[..., 0] + (pads0[1] - 2))
        r0, o0 = I.phase_gather(tbl, TB0, TC0, ridx,
                                cy[None] + zero + (pads0[0] - 2),
                                cx[None] + zero + (pads0[1] - 2))
        return jnp.stack([r1, r0]), jnp.stack([o1, o0])

    raws = timeit("L0 phase gather (2x)", gather_l0, tbl0, v0)

    from vp8oclenc_tpu.ops import pallas_kernels as PK
    cur64 = jnp.asarray(rng.integers(0, 256, (n, 64), np.uint8))

    @jax.jit
    def pallas_l0(raws, cur64, v0):
        raw, offs = raws
        return PK.fullpel_search50(raw, offs, cur64, v0, 0, nbx, W, H, True)

    timeit("L0 pallas fullpel_search50", pallas_l0, raws, cur64, v0)

    vec = None
    for lvl, rate in ((4, 16), (3, 8), (2, 4), (1, 2), (0, 1)):
        plane, pads, _ = ref_pyr[lvl]
        fn = jax.jit(lambda c, p, sv, _r=rate, _pd=pads: I.search_level(
            c, p, _pd, sv, _r, penalty=(_r < 4)))
        vec = timeit(f"search_level L{lvl} (rate {rate})",
                     fn, cur_pyr[lvl], plane, vec)

    # ---- qpel sub-stages
    fv = jnp.asarray(rng.integers(-8, 8, (3, n, 2), np.int32))

    @jax.jit
    def gather_q(tbl, fv):
        ridx = jnp.broadcast_to(jnp.arange(3)[:, None], (3, n))
        return I.phase_gather(tbl, TB0, TC0, ridx,
                              cy[None] + fv[..., 1] + (pads0[0] - 3),
                              cx[None] + fv[..., 0] + (pads0[1] - 3))

    qraw = timeit("qpel phase gather", gather_q, tbl0, fv)

    @jax.jit
    def pallas_q(qraw, cur64, v0):
        return PK.qpel_search25(qraw[0], qraw[1], cur64, v0 * 4, nbx, W, H)

    timeit("qpel pallas qpel_search25", pallas_q, qraw, cur64, v0)

    qfn = jax.jit(lambda c, p, vv: I.search_qpel(c, p, pads0, vv))
    timeit("search_qpel total", qfn, cur_pyr[0], plane0, vec)

    # ---- chroma MC
    mvs = jnp.asarray(rng.integers(-32, 32, (mbc, 4, 2), np.int32))
    sel = jnp.asarray(rng.integers(0, 3, (mbc,), np.int32))
    nbxc = (W // 2) // 4
    bx = np.tile(np.arange(nbxc), (H // 2) // 4)
    by = np.repeat(np.arange((H // 2) // 4), nbxc)
    cmb = (by // 2) * mbw + bx // 2
    cq = (by % 2) * 2 + bx % 2
    mcfn = jax.jit(lambda rp, m, s: I.mc_predict_selected(
        rp, (I.PAD_C_FULL, I.PAD_C_FULL), m, s, jnp.asarray(cmb),
        jnp.asarray(cq), 8, H // 2, W // 2))
    rup = jnp.stack([u_pad] * 3)
    timeit("mc_predict chroma (x1 plane)", mcfn, rup, mvs, sel)

    # ---- transforms: one LQ pass
    res_y = jnp.asarray(rng.integers(-128, 128, (mbc, 16, 4, 4), np.int32))
    res_u = jnp.asarray(rng.integers(-128, 128, (mbc, 4, 4, 4), np.int32))
    parts = jnp.asarray(rng.integers(0, 2, (mbc,), np.int32))
    tfn = jax.jit(lambda r, p: I.transform_mb_luma(r, p, 8, 8, 16, 16))
    timeit("transform_mb_luma (1 pass)", tfn, res_y, parts)
    cfn = jax.jit(lambda r: I.transform_mb_chroma(r, 8, 8))
    timeit("transform_mb_chroma (1 pass)", cfn, res_u)

    # ---- SSIM
    ryf = jnp.asarray(rng.integers(0, 256, (H, W), np.int32))
    ruf = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), np.int32))
    sfn = jax.jit(lambda a, b, c, d, e, f: mb_ssim_fx(a, b, c, d, e, f,
                                                      xp=jnp))
    timeit("mb_ssim (3 planes)", sfn, jnp.asarray(y).astype(jnp.int32), ryf,
           jnp.asarray(u).astype(jnp.int32), ruf,
           jnp.asarray(v).astype(jnp.int32), ruf)

    # ---- intra replace (ssim controller)
    from vp8oclenc_tpu.ops.intra_replace import intra_replace_device
    q4 = jnp.asarray(np.array([8, 10, 12, 14], np.int32))
    irfn = jax.jit(lambda yy, uu, vv, ry_, ru_, rv_, cs: intra_replace_device(
        yy, uu, vv, ry_, ru_, rv_, cs, q4, q4, q4, q4,
        jnp.int32(98000), mbw, mbh))
    cs = jnp.asarray(rng.integers(-98304, 98304, (mbc,), np.int32))
    timeit("intra_replace_device", irfn,
           jnp.asarray(y).astype(jnp.int32), jnp.asarray(u).astype(jnp.int32),
           jnp.asarray(v).astype(jnp.int32),
           ryf.astype(jnp.uint8), ruf.astype(jnp.uint8),
           ruf.astype(jnp.uint8), cs)

    # ---- loop filter + wire
    from vp8oclenc_tpu.ops.loopfilter import build_filter_from_meta_kernel
    from vp8oclenc_tpu.ops.wire import build_wire_kernel
    lp = jnp.asarray(rng.integers(-4, 4, (mbc, 25, 16), np.int16))
    meta = jnp.zeros((mbc, 11), jnp.int32)
    lf = jnp.asarray(np.broadcast_to(
        np.array([20, 30, 20, 15, 2], np.int32)[:, None], (5, 4)).copy())
    lf2 = jnp.stack([lf, lf])
    fkern = build_filter_from_meta_kernel(mbw, mbh)
    timeit("filter_from_meta (+ref state)", fkern,
           jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), lp, meta,
           cs, lf2)
    wkern = build_wire_kernel(mbc)
    timeit("wire pack", wkern, lp, meta, cs, jnp.int32(0))

    # ---- intra keyframe kernel
    from vp8oclenc_tpu.ops.intra import build_intra_kernel
    ikern = build_intra_kernel(W, H)
    timeit("intra keyframe kernel", ikern,
           jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
           jnp.int32(8), jnp.int32(10), jnp.int32(12), jnp.int32(14))

    # ---- fused totals
    for ssim_on in (False, True):
        kern = I.build_inter_kernel(W, H, ssim_enabled=ssim_on)
        yuv = jnp.asarray(np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
        q = jnp.asarray(np.array([8, 10, 12, 14], np.int32))
        args = (yuv, pyrs, tbls, u_pads, v_pads,
                jnp.asarray(np.array([True, True, True])),
                q, q, q, q, q, q,
                jnp.int32(98000 if ssim_on else -1))
        timeit(f"FUSED inter kernel ssim={ssim_on}", kern.yuv, *args)

    out = None
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        with open(out, "w") as f:
            json.dump({"sync_ms": round(1e3 * sync_latency(), 2),
                       "stages_ms": RESULTS}, f, indent=1)
        print("wrote", out)


if __name__ == "__main__":
    main()
