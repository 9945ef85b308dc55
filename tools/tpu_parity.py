"""Real-TPU Pallas parity: run every compiled Pallas kernel on the chip
against its XLA formulation on live data and record bit-identity.

CI covers the same kernel bodies in interpreter mode
(tests/test_pallas_kernels.py, tests/test_pallas_intra.py); a Mosaic
regression (layout, precision) would change streams silently — levels
still decode, PSNR drifts.  This runner pins the compiled-on-TPU kernels:

  python tools/tpu_parity.py            # writes PARITY_TPU.json

Checks (all bit-identity):
  * search_level  (fullpel_search50 vs the XLA candidate stack)
  * search_qpel   (qpel_search25 vs the XLA six-tap matmuls)
  * luma/chroma wavefront + trial_luma (vs the sheared XLA wavefronts)
  * a short 320x192 stream: tpu backend vs spec backend, byte-identical
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RESULTS = {}


def record(name, ok):
    RESULTS[name] = bool(ok)
    print(f"{name:28s} {'OK' if ok else 'MISMATCH'}")


def _search_parity():
    import jax
    import jax.numpy as jnp
    from vp8oclenc_tpu.ops import inter as I

    rng = np.random.default_rng(0)
    W, H = 640, 384
    ref = rng.integers(0, 256, (3, H, W), np.uint8)
    cur = rng.integers(0, 256, (H, W), np.uint8)
    plane = I._pad_tiles(jnp.asarray(ref), I.PAD_Y_FULL, I.PAD_Y_FULL)
    pads = (I.PAD_Y_FULL, I.PAD_Y_FULL)
    v0 = jnp.asarray(rng.integers(-7, 8, (3, (H // 8) * (W // 8), 2),
                                  np.int32)).reshape(3, H // 8, W // 8, 2)

    outs = {}
    for mode in ("0", ""):           # XLA fallback, then compiled Pallas
        os.environ["VP8TPU_PALLAS"] = mode
        lvl = jax.jit(lambda c, p, sv: I.search_level(
            c, p, pads, sv, 1, penalty=True))
        vec = lvl(jnp.asarray(cur), plane, v0)
        qp = jax.jit(lambda c, p, fv: I.search_qpel(c, p, pads, fv))
        q = qp(jnp.asarray(cur), plane, vec)
        outs[mode] = (np.asarray(vec),) + tuple(np.asarray(x) for x in q)
    os.environ.pop("VP8TPU_PALLAS", None)
    record("search_level_fullpel", np.array_equal(outs["0"][0], outs[""][0]))
    record("search_qpel_vec", np.array_equal(outs["0"][1], outs[""][1]))
    record("search_qpel_cost", np.array_equal(outs["0"][2], outs[""][2]))
    record("search_qpel_pred", np.array_equal(outs["0"][3], outs[""][3]))


def _intra_parity():
    import jax
    import jax.numpy as jnp
    from vp8oclenc_tpu.ops.intra import (_chroma_finalize,
                                         _chroma_wavefront_sheared,
                                         _luma_finalize,
                                         _luma_wavefront_sheared)
    from vp8oclenc_tpu.ops.intra_replace import _trial_luma
    from vp8oclenc_tpu.ops.pallas_intra import (chroma_wavefront,
                                                luma_wavefront, trial_luma)

    rng = np.random.default_rng(1)
    W, H = 320, 192
    y = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    w4, h4 = W // 4, H // 4
    want = jax.jit(
        lambda y: _luma_wavefront_sheared(y, w4, h4, 8, 10))(y)
    want_lv, want_md = jax.jit(
        lambda r, y: _luma_finalize(r, y, w4, h4, 8, 10))(want, y)
    got, got_lv, got_md = jax.jit(
        lambda y: luma_wavefront(y, w4, h4, 8, 10))(y)
    record("luma_wavefront", np.array_equal(np.asarray(got), np.asarray(want)))
    record("luma_levels", np.array_equal(np.asarray(got_lv),
                                         np.asarray(want_lv)))
    record("luma_modes", np.array_equal(np.asarray(got_md),
                                        np.asarray(want_md)))

    mbw, mbh = W // 16, H // 16
    uv = jnp.asarray(rng.integers(0, 256, (2, mbh * 8, mbw * 8), np.uint8))
    wantc = jax.jit(
        lambda u: _chroma_wavefront_sheared(u, mbw, mbh, 12, 14))(uv)
    wantc_lv = jax.jit(
        lambda r, u: _chroma_finalize(r, u, mbw, mbh, 12, 14))(wantc, uv)
    gotc, gotc_lv = jax.jit(
        lambda u: chroma_wavefront(u, mbw, mbh, 12, 14))(uv)
    record("chroma_wavefront", np.array_equal(np.asarray(gotc),
                                              np.asarray(wantc)))
    record("chroma_levels", np.array_equal(np.asarray(gotc_lv),
                                           np.asarray(wantc_lv)))

    mbc = mbw * mbh
    y_mb = jnp.asarray(rng.integers(0, 256, (mbc, 16, 16), np.int32))
    ftop = jnp.asarray(rng.integers(0, 256, (mbc, 21), np.int32))
    fleft = jnp.asarray(rng.integers(0, 256, (mbc, 16), np.int32))
    want_t = jax.jit(lambda a, b, c: _trial_luma(a, b, c, 8, 10))(
        y_mb, ftop, fleft)
    got_t = jax.jit(lambda a, b, c: trial_luma(a, b, c, 8, 10))(
        y_mb, ftop, fleft)
    record("trial_luma", all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(got_t, want_t)))


def _stream_parity():
    from vp8oclenc_tpu.config import EncoderConfig
    from vp8oclenc_tpu.io.y4m import Frame
    from vp8oclenc_tpu.pipeline.encoder import Encoder

    rng = np.random.default_rng(2)
    W, H = 320, 192
    base = rng.integers(0, 256, (H * 2, W * 2), np.uint8)
    frames = []
    for t in range(5):
        yy = np.ascontiguousarray(base[t:t + H, 2 * t:2 * t + W])
        frames.append(Frame(yy, yy[::2, ::2] // 2 + 60,
                            yy[1::2, 1::2] // 2 + 50))
    cfg = dict(qi_min=12, qi_max=40, gop_size=100, altref_range=3,
               num_partitions=2, threads=2, ssim_target=0.9)
    streams = {}
    for backend in ("tpu", "spec"):
        enc = Encoder(EncoderConfig(**cfg), W, H, backend=backend)
        streams[backend] = b"".join(enc.encode_frame(f) for f in frames)
    record("stream_tpu_vs_spec", streams["tpu"] == streams["spec"])


def main():
    import jax
    dev = jax.devices()[0]
    t0 = time.monotonic()
    _search_parity()
    _intra_parity()
    _stream_parity()
    out = {
        "device": f"{dev.platform} {getattr(dev, 'device_kind', '?')}",
        "ok": all(RESULTS.values()),
        "checks": RESULTS,
        "seconds": round(time.monotonic() - t0, 1),
    }
    with open("PARITY_TPU.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"parity_ok": out["ok"]}))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
