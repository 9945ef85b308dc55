"""Decompose the per-frame 1080p device time: inter kernel vs chained loop
filter vs wire pack, timed separately on the real TPU.  Also asserts the
DEFAULT-precision cost matmul is bit-exact on this hardware.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def check_cost_exact():
    from vp8oclenc_tpu.ops import transforms as OT
    from vp8oclenc_tpu.spec import transforms as ST
    rng = np.random.default_rng(3)
    x = rng.integers(-255, 256, size=(1 << 16, 16), dtype=np.int64)
    x[:64] = 255 * np.where(rng.integers(0, 2, size=(64, 16)) > 0, 1, -1)
    want = ST.dct_cost(x)
    got = np.asarray(jax.jit(OT.dct_cost)(jnp.asarray(x, jnp.int32)))
    assert np.array_equal(want, got), "cost matmul NOT exact on this backend"
    print("dct_cost DEFAULT-precision matmul: exact on", jax.devices()[0].platform)


def main():
    check_cost_exact()

    from bench import synth_1080p
    from vp8oclenc_tpu.config import EncoderConfig
    from vp8oclenc_tpu.pipeline.encoder import Encoder
    from vp8oclenc_tpu.ops.loopfilter import build_filter_from_meta_kernel
    from vp8oclenc_tpu.ops.wire import build_wire_kernel
    from vp8oclenc_tpu.pipeline.segments import prepare_segments

    n = 7
    frames = synth_1080p(n)
    cfg = EncoderConfig(qi_min=12, qi_max=40, gop_size=1000, altref_range=5)
    enc = Encoder(cfg, 1920, 1080, backend="tpu")
    for t in range(3):
        enc.encode_frame(frames[t])

    from vp8oclenc_tpu.ops.inter import build_inter_kernel
    kern = build_inter_kernel(enc.wrk_w, enc.wrk_h, ssim_enabled=False)
    be = enc.tpu
    mbw, mbh, mbc = be.mbw, be.mbh, be.mbc

    for t in range(3, n):
        f = frames[t]
        from vp8oclenc_tpu.io.y4m import pad_frame
        p = pad_frame(f)
        y, u, v = p.y, p.u, p.v
        seg = prepare_segments(cfg, y, False, False)
        ls = be.last_state
        yuv = jnp.asarray(np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
        jax.block_until_ready(yuv)
        args = (yuv, (ls[0], ls[0], ls[0]), (ls[1], ls[1], ls[1]),
                (ls[2], ls[2], ls[2]), (ls[3], ls[3], ls[3]),
                jnp.asarray(np.array([True, False, False])),
                jnp.asarray(seg.y_dc_q.astype(np.int32)),
                jnp.asarray(seg.y_ac_q.astype(np.int32)),
                jnp.asarray(seg.y2_dc_q.astype(np.int32)),
                jnp.asarray(seg.y2_ac_q.astype(np.int32)),
                jnp.asarray(seg.uv_dc_q.astype(np.int32)),
                jnp.asarray(seg.uv_ac_q.astype(np.int32)),
                jnp.int32(-1))
        t0 = time.monotonic()
        out = kern.yuv(*args)
        jax.block_until_ready(out)
        t1 = time.monotonic()
        levels_pack, meta, cur_ssim, ry, ru, rv, modes4, replaced = out

        weak = prepare_segments(cfg, y, False, False, weaken_filter=True,
                                strength=seg.raw_strength)
        lf = np.stack([
            np.stack([s_.loop_filter_level, s_.mbedge_limit,
                      s_.sub_bedge_limit, s_.interior_limit,
                      s_.hev_threshold]) for s_ in (seg, weak)
        ]).astype(np.int32)
        fkern = build_filter_from_meta_kernel(mbw, mbh)
        t2 = time.monotonic()
        fout, fstate = fkern(ry, ru, rv, levels_pack, meta, cur_ssim,
                             jnp.asarray(lf))
        jax.block_until_ready((fout, fstate))
        t3 = time.monotonic()

        wkern = build_wire_kernel(mbc)
        t4 = time.monotonic()
        head, body, stats = wkern(levels_pack, meta, cur_ssim, replaced)
        jax.block_until_ready((head, body, stats))
        t5 = time.monotonic()

        from vp8oclenc_tpu.ops.inter import build_ref_state_kernel
        rkern = build_ref_state_kernel(enc.wrk_w, enc.wrk_h)
        t6 = time.monotonic()
        st = rkern(*fout)
        jax.block_until_ready(st)
        t7 = time.monotonic()
        be.last_state = st
        be.last = fout

        print(f"frame {t}: inter={1e3*(t1-t0):7.1f}ms "
              f"filter={1e3*(t3-t2):7.1f}ms wire={1e3*(t5-t4):7.1f}ms "
              f"refstate={1e3*(t7-t6):7.1f}ms")


if __name__ == "__main__":
    main()
