"""Multi-chip end-to-end encoder: G GOP streams x T row tiles on a mesh.

Encodes keyframe-aligned GOPs in lockstep over the `gop` mesh axis (pure
data parallelism) with every frame's pixel pipeline row-sharded over `tile`
(parallel.tile halo exchange).  Keyframes run ON DEVICE (the sharded intra
wavefront step — previously every GOP start serialized onto host numpy
while all chips idled), the SSIM quality controller runs per shard with ICI
ghost rows, and SSIM-forced redo-as-key re-runs the device keyframe step
for the failing lanes.  Host-side entropy coding / bitstream assembly runs
per GOP from the per-shard wire buffers, and the per-GOP streams
concatenate — in order — into one IVF-payload sequence that is
byte-identical to the sequential single-chip encoder's
(tests/test_multichip_encode.py).

Scope note: GOP boundaries come from a host pre-pass replaying the
sequential scene-change detector (the shared scene_change_step — it reads
source chroma only, so it is computable before any encoding).  An
SSIM-forced redo (data-dependent) resets the failing lane's own altref
schedule exactly as the sequential encoder would; since each lane spans a
single GOP, redo never moves a *batch* boundary unless the sequential
encoder's quality-forced keyframe would have (in which case both encoders
place the same keyframe — tested).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from vp8oclenc_tpu.config import EncoderConfig
from vp8oclenc_tpu.io.y4m import pad_frame
from vp8oclenc_tpu.pipeline.encoder import (Encoder, FrameData,
                                            scene_change_step)
from vp8oclenc_tpu.pipeline.segments import prepare_segments
from vp8oclenc_tpu.tables import (ALTREF, ARE4X4, GOLDEN, INTRA_SEGMENT,
                                  LAST)


def plan_gops(cfg: EncoderConfig, frames, width, height):
    """Host pre-pass: replay the sequential key-frame schedule (GOP counter
    + scene-change detector) and split `frames` into keyframe-aligned runs."""
    last_key_detect, holdover = 0, False
    last_u = last_v = None
    gops, cur = [], None
    frames_until_key = 1
    fn = 0
    for f in frames:
        p = pad_frame(f)
        frames_until_key -= 1
        is_key = frames_until_key < 1
        if not is_key and last_u is not None:
            change, last_key_detect, holdover = scene_change_step(
                fn, last_key_detect, holdover, last_u, last_v, p.u, p.v)
            is_key = is_key or change
        if is_key:
            frames_until_key = cfg.gop_size
            last_key_detect = fn
            if cur:
                gops.append(cur)
            cur = []
        cur.append(p)
        last_u, last_v = p.u.copy(), p.v.copy()
        fn += 1
    if cur:
        gops.append(cur)
    return gops


def _seg_quant_stack(seg):
    return np.stack([seg.y_dc_q, seg.y_ac_q, seg.y2_dc_q, seg.y2_ac_q,
                     seg.uv_dc_q, seg.uv_ac_q]).astype(np.int32)


def _lf_stack(*segs):
    return np.stack([
        np.stack([s.loop_filter_level, s.mbedge_limit, s.sub_bedge_limit,
                  s.interior_limit, s.hev_threshold]) for s in segs
    ]).astype(np.int32)


class MultiChipEncoder:
    """Encode G GOPs in lockstep over a (gop, tile) mesh."""

    def __init__(self, cfg: EncoderConfig, width: int, height: int, mesh):
        from vp8oclenc_tpu.parallel.tile import (build_strips_fn,
                                                 build_tile_frame_step,
                                                 build_tile_key_step)
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.cfg = cfg
        self.width, self.height = width, height
        self.wrk_w = (width + 15) & ~15
        self.wrk_h = (height + 15) & ~15
        self.mesh = mesh
        self.G = mesh.shape["gop"]
        self.T = mesh.shape["tile"]
        assert (self.wrk_h // 16) % self.T == 0, \
            "MB rows must divide over the tile axis"
        self.ssim_on = cfg.ssim_target > 0.0
        self.step = build_tile_frame_step(mesh, self.wrk_w, self.wrk_h,
                                          ssim_enabled=self.ssim_on)
        self.kstep = build_tile_key_step(mesh, self.wrk_w, self.wrk_h)
        self.strips = build_strips_fn(mesh, self.wrk_w, self.wrk_h)
        self.gsh = NamedSharding(mesh, P("gop", "tile", None))
        self.rep = lambda nd: NamedSharding(mesh, P(*(("gop",) + (None,) * nd)))
        # host shells: entropy/bitstream state per GOP stream
        self.shells = [Encoder(cfg, width, height, backend="spec")
                       for _ in range(self.G)]
        self._pool = None
        # lockstep-waste accounting (VERDICT r4 #8): device lane-steps
        # whose outputs are dropped (padded lanes, short-lane repeats,
        # non-redo lanes of a redo step — the last now skipped on device)
        self.lockstep_stats = {"lane_steps": 0, "wasted_padded": 0,
                               "wasted_short": 0, "redo_steps": 0,
                               "redo_skipped_lanes": 0}

    def lockstep_waste(self) -> float:
        """Fraction of device lane-steps whose outputs were dropped."""
        s = self.lockstep_stats
        total = max(s["lane_steps"], 1)
        return (s["wasted_padded"] + s["wasted_short"]) / total

    def _executor(self):
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(
                max_workers=max(2, min(self.G, 8)))
        return self._pool

    def _place(self, arrs, nd_rep=None):
        x = jnp.asarray(np.stack(arrs))
        if nd_rep is None:
            return jax.device_put(x, self.gsh)
        return jax.device_put(x, self.rep(nd_rep))

    def _select_lanes(self, mask, a, b):
        """Per-GOP-lane pytree select: leaf = a[g] where mask[g] else b[g]."""
        m = jnp.asarray(mask)

        def sel(x, y):
            mm = m.reshape((self.G,) + (1,) * (x.ndim - 1))
            return jnp.where(mm, x, y)

        return jax.tree.map(sel, a, b)

    def _run_key_step(self, frames_g, segs_key, need=None):
        """Device keyframes: frames_g list of G padded Frames, segs_key
        list of G key SegmentData, need optional (G,) bool lane mask —
        masked-off lanes skip the key encode entirely on device (their
        outputs are zeros the caller never reads).  Returns (heads,
        bodies, modes, levels, strips)."""
        qs = np.stack([
            np.array([int(s.y_dc_q[0]), int(s.y_ac_q[0]),
                      int(s.uv_dc_q[0]), int(s.uv_ac_q[0])], np.int32)
            for s in segs_key])
        lf = np.stack([_lf_stack(s)[0] for s in segs_key])
        if need is None:
            need = np.ones(self.G, bool)
        heads, bodies, modes, lv_dev, _recon, strips = self.kstep(
            self._place(list(np.asarray(need, bool)), nd_rep=0),
            self._place([f.y for f in frames_g]),
            self._place([f.u for f in frames_g]),
            self._place([f.v for f in frames_g]),
            self._place(qs, nd_rep=1), self._place(lf, nd_rep=2))
        return np.asarray(heads), np.asarray(bodies), np.asarray(modes), \
            lv_dev, strips

    def _lane_framedata(self, heads, bodies, g, is_key, is_altref,
                        modes=None, modes4=None, lv_dev=None):
        """Assemble one lane's FrameData from its T shard wire buffers.
        Returns (fd, min_ssim_fx, sum_fx, replaced)."""
        from vp8oclenc_tpu.ops.wire import head_size, unpack_head, \
            unpack_levels, unpack_modes4
        T = self.T
        mbw = self.wrk_w // 16
        mbh = self.wrk_h // 16
        mbc = mbw * mbh
        mbc_loc = mbc // T
        hs = head_size(mbc_loc)
        bs = bodies.shape[1] // T
        levels = np.zeros((mbc, 25, 16), np.int16)
        seg_ids = np.zeros(mbc, np.int32)
        parts = np.zeros(mbc, np.int32)
        refs = np.zeros(mbc, np.int32)
        mvs = np.zeros((mbc, 4, 2), np.int16)
        mmodes = np.zeros((mbc, 16), np.int8)
        min_fx, sum_fx, replaced = 1 << 30, 0, 0
        for t in range(T):
            info = unpack_head(heads[g, t * hs:(t + 1) * hs], mbc_loc)
            body_t = bodies[g, t * bs:(t + 1) * bs]
            sl = slice(t * mbc_loc, (t + 1) * mbc_loc)
            if info["esc_overflow"]:
                # >ESC_SLOTS escapes in one MB: fetch this lane's exact
                # int16 levels from the device-resident fallback
                levels[sl] = np.asarray(lv_dev[g][sl]).astype(np.int16)
            else:
                levels[sl] = unpack_levels(
                    info, body_t[: info["n_active"] * 16], mbc_loc)
            seg_ids[sl] = info["seg"]
            parts[sl] = info["part"]
            refs[sl] = info["ref"]
            mvs[sl] = info["mvs"]
            min_fx = min(min_fx, info["ssim_min_fx"])
            sum_fx += info["ssim_sum_fx"]
            replaced += info["replaced"]
            if info["replaced"] and modes4 is not None:
                m4 = modes4[g].reshape(T, mbc_loc * 8)[t]
                mmodes[sl] = unpack_modes4(m4, mbc_loc)
        if is_key and modes is not None:
            mmodes = modes[g].astype(np.int8)
        ref_map = np.array([LAST, GOLDEN, ALTREF])
        fd = FrameData(
            mbw=mbw, mbh=mbh, is_key=is_key, is_golden=is_key,
            is_altref=is_altref or is_key, levels=levels,
            parts=np.full(mbc, ARE4X4, np.int32) if is_key else parts,
            segment_ids=np.full(mbc, INTRA_SEGMENT, np.int32) if is_key
            else seg_ids,
            modes=mmodes,
            is_inter=np.zeros(mbc, bool) if is_key else (parts != ARE4X4),
            ref_frame=np.full(mbc, LAST, np.int32) if is_key
            else ref_map[refs].astype(np.int32),
            mvs=np.zeros((mbc, 4, 2), np.int16) if is_key else mvs,
            replaced=replaced)
        return fd, min_fx, sum_fx, replaced

    def encode_gop_batch(self, gops):
        """gops: list of <= G lists of padded Frames, each starting at a
        keyframe.  Returns a list-of-lists of per-frame payload bytes."""
        from vp8oclenc_tpu.ssim_fx import WEAKEN_FX, target_fx

        G, T = self.G, self.T
        cfg = self.cfg
        mbc = (self.wrk_w // 16) * (self.wrk_h // 16)
        assert len(gops) <= G
        # pad the batch: duplicate the last GOP into unused lanes; short
        # GOPs repeat their final frame (device lockstep; outputs dropped)
        n_real = len(gops)
        gops = list(gops) + [gops[-1]] * (G - n_real)
        L = max(len(gops[g]) for g in range(n_real))
        payloads = [[] for _ in range(G)]
        tfx3 = target_fx(cfg.ssim_target) if self.ssim_on else -1

        # ---- frame 0: keyframes on device (sharded intra wavefront) ----
        self.lockstep_stats["lane_steps"] += G
        self.lockstep_stats["wasted_padded"] += G - n_real
        frames0 = [gops[g][0] for g in range(G)]
        segs_key = [prepare_segments(cfg, f.y, True, True) for f in frames0]
        heads, bodies, modes, klv, strips = self._run_key_step(
            frames0, segs_key)
        for g in range(n_real):
            fd, _mn, _sm, _rp = self._lane_framedata(
                heads, bodies, g, is_key=True, is_altref=True, modes=modes,
                lv_dev=klv)
            payloads[g].append(self.shells[g]._finish_frame(fd, segs_key[g]))

        last = golden = altref = strips
        prev_is_golden = [True] * G
        prev_is_altref = [True] * G
        frames_until_altref = [cfg.altref_range] * G
        golden_no = [0] * G
        altref_no = [0] * G

        # ---- inter frames in lockstep ----
        for i in range(1, L):
            self.lockstep_stats["lane_steps"] += G
            self.lockstep_stats["wasted_padded"] += G - n_real
            self.lockstep_stats["wasted_short"] += sum(
                1 for g in range(n_real) if i >= len(gops[g]))
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
                lf_l.append(_lf_stack(seg, weak))
                use_g = not prev_is_golden[g]
                use_a = (not prev_is_altref[g]) and \
                    (altref_no[g] != golden_no[g])
                rv_l.append(np.array([True, use_g, use_a]))

            segq = [_seg_quant_stack(s) for (s, _w) in segs_l]
            ref_state = (last, golden, altref)
            heads, bodies, modes4, lv_dev, _recon, new_last = self.step(
                self._place([c.y for c in cur]),
                self._place([c.u for c in cur]),
                self._place([c.v for c in cur]),
                ref_state, self._place(rv_l, nd_rep=1),
                self._place(segq, nd_rep=2), self._place(lf_l, nd_rep=3),
                self._place([np.int32(tfx3)] * G, nd_rep=0))
            heads = np.asarray(heads)
            bodies = np.asarray(bodies)
            modes4 = np.asarray(modes4)

            # per-lane assembly + SSIM redo decision (check_SSIM,
            # vp8enc.cpp:443-453); lanes unpack in parallel on the host
            # thread pool (numpy releases the GIL) — the per-(GxT) python
            # walk was the dominant host cost at 1080p x 8 lanes
            fds = [None] * G
            redo = [False] * G
            active_lanes = [g for g in range(G)
                            if i < len(gops[g]) and g < n_real]
            lane_out = dict(zip(active_lanes, self._executor().map(
                lambda g: self._lane_framedata(
                    heads, bodies, g, is_key=False,
                    is_altref=is_altref_l[g], modes4=modes4, lv_dev=lv_dev),
                active_lanes)))
            for g in active_lanes:
                seg, weak = segs_l[g]
                fd, min_fx, sum_fx, replaced = lane_out[g]
                if self.ssim_on and (replaced > mbc // 6
                                     or sum_fx < tfx3 * mbc):
                    redo[g] = True
                    continue
                if min_fx > WEAKEN_FX:
                    seg.__dict__.update(weak.__dict__)
                fds[g] = (fd, seg)

            if any(redo):
                # re-encode ONLY the failing lanes' frames as keyframes on
                # device (the lane mask is a real branch at one lane per
                # device; non-redo lanes' devices idle instead of burning
                # a discarded key wavefront)
                self.lockstep_stats["redo_steps"] += 1
                self.lockstep_stats["redo_skipped_lanes"] += \
                    G - int(np.sum(redo))
                segs_redo = [prepare_segments(
                    cfg, cur[g].y, True, True,
                    strength=segs_l[g][0].raw_strength) for g in range(G)]
                kh, kb, kmodes, klv2, kstrips = self._run_key_step(
                    cur, segs_redo, need=np.array(redo))
                for g in range(G):
                    if not redo[g]:
                        continue
                    fd, _mn, _sm, _rp = self._lane_framedata(
                        kh, kb, g, is_key=True, is_altref=True, modes=kmodes,
                        lv_dev=klv2)
                    fds[g] = (fd, segs_redo[g])
                mask = np.array(redo)
                new_last = self._select_lanes(mask, kstrips, new_last)

            done = [g for g in range(n_real) if fds[g] is not None]
            for g, payload in zip(done, self._executor().map(
                    lambda g: self.shells[g]._finish_frame(*fds[g]), done)):
                payloads[g].append(payload)

            # reference bookkeeping (per lane; redo lanes reset like a key)
            last = new_last
            promote_a = [redo[g] or is_altref_l[g] for g in range(G)]
            if any(promote_a):
                altref = self._select_lanes(np.array(promote_a), new_last,
                                            altref)
            if any(redo):
                golden = self._select_lanes(np.array(redo), new_last, golden)
            for g in range(G):
                if redo[g]:
                    golden_no[g] = i
                    altref_no[g] = i
                    frames_until_altref[g] = cfg.altref_range
                    prev_is_golden[g] = True
                    prev_is_altref[g] = True
                else:
                    if is_altref_l[g]:
                        altref_no[g] = i
                    prev_is_golden[g] = False
                    prev_is_altref[g] = is_altref_l[g]

        return payloads[:n_real]


def encode_frames_multichip(cfg, frames, width, height, mesh,
                            return_encoder=False):
    """Encode a frame sequence over the mesh; returns per-frame payloads in
    stream order (concatenating the independent GOP streams).  With
    return_encoder=True also returns the MultiChipEncoder (lockstep-waste
    stats etc.)."""
    gops = plan_gops(cfg, frames, width, height)
    enc = MultiChipEncoder(cfg, width, height, mesh)
    out = []
    G = mesh.shape["gop"]
    for k in range(0, len(gops), G):
        for stream in enc.encode_gop_batch(gops[k:k + G]):
            out.extend(stream)
    return (out, enc) if return_encoder else out
