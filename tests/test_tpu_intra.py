import numpy as np
import pytest

from vp8oclenc_tpu.config import EncoderConfig
from vp8oclenc_tpu.pipeline.segments import prepare_segments
from vp8oclenc_tpu.spec import intra as SPEC
from vp8oclenc_tpu.spec import transforms as ST


def synth(w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (((xx * 5 + yy * 3) % 220) + rng.integers(0, 35, (h, w))).clip(0, 255)
    u = ((xx[::2, ::2] * 2 + 30) % 210 + rng.integers(0, 20, (h // 2, w // 2))).clip(0, 255)
    v = ((yy[::2, ::2] * 3 + 60) % 210 + rng.integers(0, 20, (h // 2, w // 2))).clip(0, 255)
    return y.astype(np.uint8), u.astype(np.uint8), v.astype(np.uint8)


def test_jax_transforms_match_numpy():
    import jax.numpy as jnp
    from vp8oclenc_tpu.ops import transforms as JT
    rng = np.random.default_rng(0)
    res = rng.integers(-255, 256, (32, 4, 4)).astype(np.int32)
    assert np.array_equal(np.asarray(JT.fdct4x4(jnp.asarray(res))), ST.fdct4x4(res))
    c = ST.fdct4x4(res)
    for dcq, acq in ((4, 4), (17, 25), (157, 284)):
        ql = ST.quant4x4(c, dcq, acq)
        assert np.array_equal(
            np.asarray(JT.quant4x4(jnp.asarray(c), dcq, acq)), ql)
        dq = ST.dequant4x4(ql, dcq, acq)
        assert np.array_equal(
            np.asarray(JT.idct4x4(jnp.asarray(dq))), ST.idct4x4(dq))
    dcs = rng.integers(-2000, 2000, (8, 4, 4)).astype(np.int32)
    assert np.array_equal(np.asarray(JT.fwht4x4(jnp.asarray(dcs))), ST.fwht4x4(dcs))
    w = ST.fwht4x4(dcs)
    assert np.array_equal(np.asarray(JT.iwht4x4(jnp.asarray(w))), ST.iwht4x4(w))
    assert np.array_equal(np.asarray(JT.dct_weight(jnp.asarray(res))),
                          ST.dct_weight(res))


@pytest.mark.parametrize("size,qi", [((64, 48), 10), ((96, 80), 35)])
def test_tpu_intra_matches_spec(size, qi):
    from vp8oclenc_tpu.ops.intra import encode_intra_frame_tpu
    w, h = size
    y, u, v = synth(w, h, seed=qi)
    cfg = EncoderConfig(qi_min=qi, qi_max=qi)
    seg = prepare_segments(cfg, y, True, True)
    lv_s, md_s, rec_s = SPEC.encode_intra_frame(y, u, v, seg)
    lv_t, md_t, rec_t = encode_intra_frame_tpu(y, u, v, seg)
    assert np.array_equal(md_t, md_s), \
        f"modes differ in {np.sum(md_t != md_s)} blocks"
    assert np.array_equal(rec_t[0], rec_s[0]), \
        f"recon Y differs: {np.sum(rec_t[0] != rec_s[0])} px"
    assert np.array_equal(rec_t[1], rec_s[1])
    assert np.array_equal(rec_t[2], rec_s[2])
    assert np.array_equal(lv_t, lv_s)


def test_sixtap_seamless_equals_quadrant():
    """search_qpel's shared-horizontal-pass interpolation must equal the
    quadrant-wise construction (ops/inter._sixtap_interp8, which mirrors the
    reference's construct, GPU_kernels.cl:563-774) for every phase pair."""
    import numpy as np
    import jax.numpy as jnp
    from vp8oclenc_tpu.ops.inter import _sixtap_interp8
    from vp8oclenc_tpu.tables import SIXTAP_FILTERS

    rng = np.random.default_rng(5)
    patch = jnp.asarray(rng.integers(0, 256, (32, 17, 17)), jnp.int32)
    for dx in range(-2, 3):
        sx = (dx % 4 + 4) % 4
        ox = (dx - sx) // 4
        fx = SIXTAP_FILTERS[sx * 2]
        bx = 3 + ox - 2
        h = sum(int(fx[k]) * patch[..., :, bx + k: bx + k + 8]
                for k in range(6) if int(fx[k]) != 0)
        h = jnp.clip((h + 64) >> 7, 0, 255)
        for dy in range(-2, 3):
            sy = (dy % 4 + 4) % 4
            oy = (dy - sy) // 4
            fy = SIXTAP_FILTERS[sy * 2]
            by = 3 + oy - 2
            v = sum(int(fy[k]) * h[..., by + k: by + k + 8, :]
                    for k in range(6) if int(fy[k]) != 0)
            seamless = jnp.clip((v + 64) >> 7, 0, 255)
            sub = patch[..., by: by + 13, bx: bx + 13]
            quad = _sixtap_interp8(sub, sx * 2, sy * 2)
            assert np.array_equal(np.asarray(seamless), np.asarray(quad)), \
                f"dx={dx} dy={dy}"


def test_dct_cost_rows64_spec_matches_ops():
    """spec.transforms.dct_cost_rows64 (numpy oracle) is bit-identical to
    ops.transforms.dct_cost_rows64 (MXU matmul path) — per-quadrant
    >> COST_SHIFT then quad sum."""
    import jax.numpy as jnp
    from vp8oclenc_tpu.ops import transforms as JT
    rng = np.random.default_rng(7)
    rows = rng.integers(-255, 256, (33, 5, 64), np.int64)
    want = ST.dct_cost_rows64(rows)
    got = np.asarray(JT.dct_cost_rows64(jnp.asarray(rows, jnp.int32)))
    assert np.array_equal(got, want)
    got_bf = np.asarray(JT.dct_cost_rows64(jnp.asarray(rows, jnp.bfloat16)))
    assert np.array_equal(got_bf, want)
