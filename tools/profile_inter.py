"""Bisect the fused 1080p inter kernel into separately-jitted stages and
time each on the real device: pyramid levels, full-pel search per level,
qpel refine, chroma MC, segment transform pass, SSIM, intra-replace.

Each stage is wrapped in its own jax.jit over realistic inputs so the sum
approximates (from above) the fused kernel; the fused total is printed for
comparison.  Run on the TPU host: python tools/profile_inter.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

W, H = 1920, 1088
REPS = 4


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(REPS):
        t0 = time.monotonic()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    print(f"{name:34s} {1e3 * best:8.2f} ms")
    return out


def main():
    from vp8oclenc_tpu.ops import inter as I
    from vp8oclenc_tpu.ops import transforms as T
    from vp8oclenc_tpu.ssim_fx import mb_ssim_fx

    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (H, W), np.uint8)
    u = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    v = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    refs = rng.integers(0, 256, (3, H, W), np.uint8)
    refs_u = rng.integers(0, 256, (3, H // 2, W // 2), np.uint8)
    refs_v = rng.integers(0, 256, (3, H // 2, W // 2), np.uint8)
    mbw, mbh, mbc = W // 16, H // 16, (W // 16) * (H // 16)
    nby, nbx = H // 8, W // 8

    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind)

    # ---- ref-state build (pyramid + padded chroma) ----
    rkern = I.build_ref_state_kernel(W, H)
    ry, ru, rv = (jnp.asarray(refs[0]), jnp.asarray(refs_u[0]),
                  jnp.asarray(refs_v[0]))
    state = timeit("ref_state (pyramid+pad)", rkern, ry, ru, rv)
    pyr, u_pad, v_pad = state
    pyrs = (pyr, pyr, pyr)
    u_pads = (u_pad, u_pad, u_pad)
    v_pads = (v_pad, v_pad, v_pad)

    # ---- current pyramid ----
    @jax.jit
    def cur_pyr_fn(y):
        out = [y]
        for _ in range(4):
            out.append(I.downsample2(out[-1]))
        return tuple(out)

    cur_pyr = timeit("cur pyramid", cur_pyr_fn, jnp.asarray(y))

    # ---- search levels ----
    ref_pyr = []
    pad, h, w = I.PAD_Y_FULL, H, W
    for lvl in range(5):
        stacked = jnp.stack([pyr[lvl]] * 3)
        ref_pyr.append((stacked, (pad, pad), (h, w)))
        pad //= 2
        h //= 2
        w //= 2

    vec = None
    for lvl, rate in ((4, 16), (3, 8), (2, 4), (1, 2), (0, 1)):
        plane, pads, _ = ref_pyr[lvl]
        fn = jax.jit(lambda c, p, sv, _r=rate, _pd=pads: I.search_level(
            c, p, _pd, sv, _r, penalty=(_r < 4)))
        vec = timeit(f"search_level L{lvl} (rate {rate})",
                     fn, cur_pyr[lvl], plane, vec)

    # ---- qpel ----
    plane0, pads0, _ = ref_pyr[0]
    qfn = jax.jit(lambda c, p, v: I.search_qpel(c, p, pads0, v))
    qout = timeit("search_qpel (+fused luma MC)", qfn, cur_pyr[0], plane0, vec)
    vecs, diffs, best_pred = qout

    # ---- chroma MC ----
    mvs = jnp.asarray(rng.integers(-32, 32, (mbc, 4, 2), np.int32))
    sel = jnp.asarray(rng.integers(0, 3, (mbc,), np.int32))

    def cmap():
        bx = np.tile(np.arange(W // 16), H // 16)
        by = np.repeat(np.arange(H // 16), W // 16)
        del bx, by
        nbxc = W // 8
        bx2 = np.tile(np.arange(nbxc // 2 * 2) % (nbxc // 2 * 2), 1)
        return None

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

    # ---- transforms: one LQ pass ----
    res_y = jnp.asarray(rng.integers(-128, 128, (mbc, 16, 4, 4), np.int32))
    res_u = jnp.asarray(rng.integers(-128, 128, (mbc, 4, 4, 4), np.int32))
    parts = jnp.asarray(rng.integers(0, 2, (mbc,), np.int32))
    tfn = jax.jit(lambda r, p: I.transform_mb_luma(r, p, 8, 8, 16, 16))
    timeit("transform_mb_luma (1 pass)", tfn, res_y, parts)
    cfn = jax.jit(lambda r: I.transform_mb_chroma(r, 8, 8))
    timeit("transform_mb_chroma (1 pass)", cfn, res_u)

    # ---- SSIM ----
    ryf = jnp.asarray(rng.integers(0, 256, (H, W), np.int32))
    ruf = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), np.int32))
    sfn = jax.jit(lambda a, b, c, d, e, f: mb_ssim_fx(a, b, c, d, e, f, xp=jnp))
    timeit("mb_ssim (3 planes)", sfn, jnp.asarray(y).astype(jnp.int32), ryf,
           jnp.asarray(u).astype(jnp.int32), ruf,
           jnp.asarray(v).astype(jnp.int32), ruf)

    # ---- intra replace (ssim controller) ----
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

    # ---- fused totals ----
    for ssim_on in (False, True):
        kern = I.build_inter_kernel(W, H, ssim_enabled=ssim_on)
        yuv = jnp.asarray(np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
        q = jnp.asarray(np.array([8, 10, 12, 14], np.int32))
        args = (yuv, pyrs, u_pads, v_pads,
                jnp.asarray(np.array([True, True, True])),
                q, q, q, q, q, q,
                jnp.int32(98000 if ssim_on else -1))
        timeit(f"FUSED inter kernel ssim={ssim_on}", kern.yuv, *args)


if __name__ == "__main__":
    main()
