"""Multi-chip end-to-end encoder: G GOP streams x T row tiles on a mesh.

Encodes keyframe-aligned GOPs in lockstep over the `gop` mesh axis (pure
data parallelism) with every frame's pixel pipeline row-sharded over `tile`
(parallel.tile halo exchange).  Host-side entropy coding / bitstream
assembly runs per GOP from the per-shard wire buffers, and the per-GOP
streams concatenate — in order — into one IVF-payload sequence that is
byte-identical to the sequential single-chip encoder's
(tests/test_multichip_encode.py).

Scope notes (v1): the SSIM controller is off in the sharded pixel step
(ssim_target < 0; its intra replacement needs cross-shard recon rows), and
GOP boundaries come from a host pre-pass that replays the sequential
scene-change detector (vp8enc.cpp:265-311 — it reads source chroma only,
so it is computable before any encoding).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from vp8oclenc_tpu.config import EncoderConfig
from vp8oclenc_tpu.io.y4m import Frame, pad_frame
from vp8oclenc_tpu.pipeline.encoder import Encoder, FrameData
from vp8oclenc_tpu.pipeline.segments import prepare_segments
from vp8oclenc_tpu.tables import ALTREF, ARE4X4, GOLDEN, LAST


def plan_gops(cfg: EncoderConfig, frames, width, height):
    """Host pre-pass: replay the sequential key-frame schedule (GOP counter
    + scene-change detector) and split `frames` into keyframe-aligned runs."""
    enc = Encoder.__new__(Encoder)          # detector state only
    enc.frame_number = 0
    enc.last_key_detect = 0
    enc._scene_holdover = False
    enc.last_u = None
    enc.last_v = None
    gops, cur = [], None
    frames_until_key = 1
    for f in frames:
        p = pad_frame(f)
        frames_until_key -= 1
        is_key = frames_until_key < 1
        if not is_key and Encoder._scene_change(enc, p.u, p.v):
            is_key = True
        if is_key:
            frames_until_key = cfg.gop_size
            if cur:
                gops.append(cur)
            cur = []
        cur.append(p)
        enc.last_u = p.u.copy()
        enc.last_v = p.v.copy()
        enc.frame_number += 1
    if cur:
        gops.append(cur)
    return gops


class MultiChipEncoder:
    """Encode G GOPs in lockstep over a (gop, tile) mesh."""

    def __init__(self, cfg: EncoderConfig, width: int, height: int, mesh):
        from vp8oclenc_tpu.parallel.tile import (build_strips_fn,
                                                 build_tile_frame_step)
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert cfg.ssim_target <= 0, "SSIM controller unsupported multichip"
        self.cfg = cfg
        self.width, self.height = width, height
        self.wrk_w = (width + 15) & ~15
        self.wrk_h = (height + 15) & ~15
        self.mesh = mesh
        self.G = mesh.shape["gop"]
        self.T = mesh.shape["tile"]
        assert (self.wrk_h // 16) % self.T == 0, \
            "MB rows must divide over the tile axis"
        self.step = build_tile_frame_step(mesh, self.wrk_w, self.wrk_h)
        self.strips = build_strips_fn(mesh, self.wrk_w, self.wrk_h)
        self.gsh = NamedSharding(mesh, P("gop", "tile", None))
        self.rep = lambda nd: NamedSharding(mesh, P(*(("gop",) + (None,) * nd)))
        # host shells: entropy/bitstream state per GOP stream
        self.shells = [Encoder(cfg, width, height, backend="spec")
                       for _ in range(self.G)]

    def _place(self, arrs, nd_rep=None):
        x = jnp.asarray(np.stack(arrs))
        if nd_rep is None:
            return jax.device_put(x, self.gsh)
        return jax.device_put(x, self.rep(nd_rep))

    def encode_gop_batch(self, gops):
        """gops: list of <= G lists of padded Frames, each starting at a
        keyframe.  Returns a list-of-lists of per-frame payload bytes."""
        from vp8oclenc_tpu.ops.wire import (head_size, stats_sum_fx,
                                            unpack_head, unpack_levels)
        from vp8oclenc_tpu.spec import intra as SPEC_INTRA
        from vp8oclenc_tpu.ssim_fx import WEAKEN_FX

        G, T = self.G, self.T
        cfg = self.cfg
        mbw = self.wrk_w // 16
        mbh = self.wrk_h // 16
        mbc = mbw * mbh
        mbc_loc = mbc // T
        assert len(gops) <= G
        # pad the batch: duplicate the last GOP into unused lanes, pad
        # short GOPs by repeating their final frame (outputs dropped)
        n_real = len(gops)
        gops = list(gops) + [gops[-1]] * (G - n_real)
        L = max(len(g) for g in gops)
        payloads = [[] for _ in range(G)]

        # ---- frame 0: keyframes (host spec intra; identical to the TPU
        # intra wavefront by construction, tests/test_tpu_intra.py) ----
        segs = []
        recon_y, recon_u, recon_v = [], [], []
        for g in range(G):
            f = gops[g][0]
            seg = prepare_segments(cfg, f.y, True, True)
            levels, modes, recon = SPEC_INTRA.encode_intra_frame(
                f.y, f.u, f.v, seg)
            from vp8oclenc_tpu.tables import INTRA_SEGMENT
            fd = FrameData(
                mbw=mbw, mbh=mbh, is_key=True, is_golden=True,
                is_altref=True, levels=levels,
                parts=np.full(mbc, ARE4X4, np.int32),
                segment_ids=np.full(mbc, INTRA_SEGMENT, np.int32),
                modes=modes, is_inter=np.zeros(mbc, bool),
                ref_frame=np.full(mbc, LAST, np.int32),
                mvs=np.zeros((mbc, 4, 2), np.int16))
            from vp8oclenc_tpu.spec import loopfilter as SPEC_LF
            from vp8oclenc_tpu.entropy import tokens as TOK
            skip, _ = TOK.mb_skip_flags(fd.levels, fd.parts)
            inner = np.ones(mbc, bool)
            ry, ru, rv = [r.copy() for r in recon]
            SPEC_LF.loop_filter_frame(ry, ru, rv, fd.segment_ids, inner, seg)
            payloads[g].append(self.shells[g]._finish_frame(fd, seg))
            segs.append(seg)
            recon_y.append(ry)
            recon_u.append(ru)
            recon_v.append(rv)

        state = self.strips(self._place(recon_y), self._place(recon_u),
                            self._place(recon_v))
        last = golden = altref = state
        prev_is_golden = [True] * G
        prev_is_altref = [True] * G
        frames_until_altref = [cfg.altref_range] * G
        golden_no = [0] * G
        altref_no = [0] * G

        # ---- inter frames in lockstep ----
        for i in range(1, L):
            cur = [gops[g][min(i, len(gops[g]) - 1)] for g in range(G)]
            is_altref_l, segs_l, lf_l, rv_l = [], [], [], []
            for g in range(G):
                frames_until_altref[g] -= 1
                is_altref = frames_until_altref[g] < 1
                if is_altref:
                    frames_until_altref[g] = cfg.altref_range
                is_altref_l.append(is_altref)
                seg = prepare_segments(cfg, cur[g].y, False, is_altref)
                weak = prepare_segments(cfg, cur[g].y, False, is_altref,
                                        weaken_filter=True,
                                        strength=seg.raw_strength)
                segs_l.append((seg, weak))
                lf_l.append(np.stack([
                    np.stack([s.loop_filter_level, s.mbedge_limit,
                              s.sub_bedge_limit, s.interior_limit,
                              s.hev_threshold]) for s in (seg, weak)
                ]).astype(np.int32))
                use_g = not prev_is_golden[g]
                use_a = (not prev_is_altref[g]) and \
                    (altref_no[g] != golden_no[g])
                rv_l.append(np.array([True, use_g, use_a]))

            segq = [np.stack([s.y_dc_q, s.y_ac_q, s.y2_dc_q, s.y2_ac_q,
                              s.uv_dc_q, s.uv_ac_q]).astype(np.int32)
                    for (s, _w) in segs_l]
            ref_state = (last, golden, altref)
            heads, bodies, _recon, new_last = self.step(
                self._place([c.y for c in cur]),
                self._place([c.u for c in cur]),
                self._place([c.v for c in cur]),
                ref_state, self._place(rv_l, nd_rep=1),
                self._place(segq, nd_rep=2), self._place(lf_l, nd_rep=3))
            heads = np.asarray(heads)
            bodies = np.asarray(bodies)
            hs = head_size(mbc_loc)
            bs = bodies.shape[1] // T

            for g in range(G):
                if i >= len(gops[g]) or g >= n_real:
                    continue
                seg, weak = segs_l[g]
                levels = np.zeros((mbc, 25, 16), np.int16)
                seg_ids = np.zeros(mbc, np.int32)
                parts = np.zeros(mbc, np.int32)
                refs = np.zeros(mbc, np.int32)
                mvs = np.zeros((mbc, 4, 2), np.int16)
                min_fx = 1 << 30
                for t in range(T):
                    info = unpack_head(heads[g, t * hs:(t + 1) * hs], mbc_loc)
                    body_t = bodies[g, t * bs:(t + 1) * bs]
                    sl = slice(t * mbc_loc, (t + 1) * mbc_loc)
                    levels[sl] = unpack_levels(
                        info, body_t[: info["n_active"] * 16], mbc_loc)
                    seg_ids[sl] = info["seg"]
                    parts[sl] = info["part"]
                    refs[sl] = info["ref"]
                    mvs[sl] = info["mvs"]
                    min_fx = min(min_fx, info["ssim_min_fx"])
                if min_fx > WEAKEN_FX:
                    seg.__dict__.update(weak.__dict__)
                ref_map = np.array([LAST, GOLDEN, ALTREF])
                fd = FrameData(
                    mbw=mbw, mbh=mbh, is_key=False, is_golden=False,
                    is_altref=is_altref_l[g], levels=levels,
                    parts=parts, segment_ids=seg_ids,
                    modes=np.zeros((mbc, 16), np.int8),
                    is_inter=np.ones(mbc, bool),
                    ref_frame=ref_map[refs].astype(np.int32), mvs=mvs)
                payloads[g].append(self.shells[g]._finish_frame(fd, seg))

            # reference bookkeeping (uniform schedule across the batch)
            last = new_last
            if is_altref_l[0]:
                altref = new_last
            for g in range(G):
                if is_altref_l[g]:
                    altref_no[g] = i
                prev_is_golden[g] = False
                prev_is_altref[g] = is_altref_l[g]

        return payloads[:n_real]


def encode_frames_multichip(cfg, frames, width, height, mesh):
    """Encode a frame sequence over the mesh; returns per-frame payloads in
    stream order (concatenating the independent GOP streams)."""
    gops = plan_gops(cfg, frames, width, height)
    enc = MultiChipEncoder(cfg, width, height, mesh)
    out = []
    G = mesh.shape["gop"]
    for k in range(0, len(gops), G):
        for stream in enc.encode_gop_batch(gops[k:k + G]):
            out.extend(stream)
    return out
