"""TPU backend: device-resident encoder state + jitted kernels.

Reference pixels (LAST/GOLDEN/ALTREF) live on the TPU across frames — the
host only ships the current source frame up and the coefficient levels /
per-MB metadata down, erasing the reference encoder's per-frame
host<->device copies (SURVEY.md §3.2 boundary list).  Reconstruction is
materialized to numpy lazily (tests, dumps, SSIM intra replacement).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from vp8oclenc_tpu.config import EncoderConfig
from vp8oclenc_tpu.tables import ALTREF, GOLDEN, LAST


from functools import partial

# One background thread materializes each frame's combined head+body D2H as
# soon as the device chain is dispatched: np.asarray(combined) blocks for
# device completion + the full wire time of the transfer (~25-60 ms at
# 1080p through the tunnel), and paying that inside finalize serialized it
# with the host entropy/packing of neighbouring frames.  A single worker
# keeps fetches in dispatch order.
_FETCH_POOL = None


def _fetch_async(arr):
    global _FETCH_POOL
    if _FETCH_POOL is None:
        from concurrent.futures import ThreadPoolExecutor
        _FETCH_POOL = ThreadPoolExecutor(max_workers=1)
    return _FETCH_POOL.submit(np.asarray, arr)


@partial(jax.jit, static_argnums=1)
def _slice_bucket(body, size: int):
    return jax.lax.slice_in_dim(body, 0, size, axis=0)


def _fetch_prefix(body, n: int) -> np.ndarray:
    """First n bytes of a device u8 vector in ONE transfer of the next
    power-of-two bucket size (compiled once per bucket -- a direct body[:n]
    would build a fresh XLA slice executable per distinct n, a per-frame
    recompile through the tunnel costing ~500 ms)."""
    if n <= 0:
        return np.zeros(0, np.uint8)
    total = body.shape[0]
    size = 1 << 14
    while size < n:
        size <<= 1
    if size >= total:
        return np.asarray(body)[:n]
    return np.asarray(_slice_bucket(body, size))[:n]


class TPUBackend:
    def __init__(self, cfg: EncoderConfig, wrk_w: int, wrk_h: int) -> None:
        self.cfg = cfg
        self.wrk_w = wrk_w
        self.wrk_h = wrk_h
        self.mbw = wrk_w // 16
        self.mbh = wrk_h // 16
        self.mbc = self.mbw * self.mbh
        # device state: pre-filter pending recon, post-filter refs
        self.pending = None            # (y, u, v) device, before loop filter
        self.last = None               # (y, u, v) device, post filter
        self.golden = None
        self.altref = None
        self.filtered = False          # pixel kernel already ran the filter
        # per-ref search state (padded 5-level pyramid + padded chroma),
        # built once per new reference and reused across frames
        self.last_state = None
        self.golden_state = None
        self.altref_state = None
        self._body_guess = 1 << 16     # predicted wire-body bytes/frame
        self._key_body_guess = wrk_w * wrk_h   # keyframe bodies are dense
        self._buckets_warm = False
        self._key_meta = None          # cached constant meta for keyframes
        self._key_ssim = None

    def _set_last(self, recon) -> None:
        from vp8oclenc_tpu.ops.inter import build_ref_state_kernel
        self.last = recon
        self.last_state = build_ref_state_kernel(
            self.wrk_w, self.wrk_h)(*recon)

    def _split_yuv(self, yuv_dev):
        """Device-side slice of a prefetched flat yuv buffer into planes."""
        ny = self.wrk_h * self.wrk_w
        nc = (self.wrk_h // 2) * (self.wrk_w // 2)
        return (yuv_dev[:ny].reshape(self.wrk_h, self.wrk_w),
                yuv_dev[ny:ny + nc].reshape(self.wrk_h // 2, self.wrk_w // 2),
                yuv_dev[ny + nc:].reshape(self.wrk_h // 2, self.wrk_w // 2))

    # -------------------------------------------------- intra
    def encode_intra_frame(self, y, u, v, seg, yuv_dev=None):
        """Device-chained keyframe: intra wavefront -> loop filter +
        next-frame ref state -> compact wire pack, all dispatched async;
        host-bound data leaves as ONE combined head+body transfer exactly
        like the inter path (the raw int16 levels are ~6.5 MB at 1080p —
        ~260 ms through the tunnel — while the int8-compacted body is
        about half that, and the transfer overlaps later dispatch)."""
        from vp8oclenc_tpu.ops.intra import build_intra_kernel
        from vp8oclenc_tpu.ops.loopfilter import build_filter_from_meta_kernel
        from vp8oclenc_tpu.ops.wire import (body_capacity, build_wire_kernel,
                                            head_plus_body, pick_bucket,
                                            warm_buckets)
        from vp8oclenc_tpu.tables import ARE4X4, INTRA_SEGMENT

        kern = build_intra_kernel(self.wrk_w, self.wrk_h)
        sid = 0
        if yuv_dev is not None:
            yd, ud, vd = self._split_yuv(yuv_dev)
        else:
            yd, ud, vd = jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)
        ry, ru, rv, levels_pack, modes = kern(
            yd, ud, vd,
            jnp.int32(int(seg.y_dc_q[sid])), jnp.int32(int(seg.y_ac_q[sid])),
            jnp.int32(int(seg.uv_dc_q[sid])), jnp.int32(int(seg.uv_ac_q[sid])))

        mbc = self.mbc
        if self._key_meta is None:
            meta = np.zeros((mbc, 11), np.int32)
            meta[:, 0] = INTRA_SEGMENT
            meta[:, 1] = ARE4X4
            self._key_meta = jnp.asarray(meta)
            self._key_ssim = jnp.zeros((mbc,), jnp.int32)
        lf = np.stack([np.stack([seg.loop_filter_level, seg.mbedge_limit,
                                 seg.sub_bedge_limit, seg.interior_limit,
                                 seg.hev_threshold])] * 2).astype(np.int32)
        fkern = build_filter_from_meta_kernel(self.mbw, self.mbh)
        filtered, filtered_state = fkern(ry, ru, rv, levels_pack,
                                         self._key_meta, self._key_ssim,
                                         jnp.asarray(lf))

        if not self._buckets_warm:
            warm_buckets(mbc)
            self._buckets_warm = True
        head, body, _stats = build_wire_kernel(mbc)(
            levels_pack, self._key_meta, self._key_ssim, jnp.int32(0))
        bucket = pick_bucket(self._key_body_guess, body_capacity(mbc))
        combined = head_plus_body(head, body, bucket)
        for buf in (combined, modes):
            try:
                buf.copy_to_host_async()
            except AttributeError:
                pass
        fetch = _fetch_async(combined)

        self.last = filtered
        self.last_state = filtered_state
        self.pending = None
        self.filtered = True
        return (fetch, bucket, body, levels_pack, modes), PendingRecon(self)

    # -------------------------------------------------- inter
    def encode_inter_frame(self, enc, y, u, v, seg, is_golden, is_altref,
                           yuv_dev=None):
        """One fused device chain: pixel kernel (with the batched SSIM
        intra-replacement when -SSIM-target is on) -> loop filter -> wire
        pack.  Host-bound data leaves as a small head (async) + the body's
        used prefix (lazy).  With SSIM on, the redo-as-key decision
        (check_SSIM, vp8enc.cpp:443-453) is SPECULATIVE: the frame
        proceeds, the verdict is read from the wire head at finalize time
        (one pipeline step later), and on the rare redo the caller
        restores its pre-frame snapshot and re-encodes — a blocking
        per-frame stats read costs a full tunnel sync and halved the
        pipelined SSIM-mode throughput."""
        from vp8oclenc_tpu.ops.inter import build_inter_kernel
        from vp8oclenc_tpu.ops.loopfilter import build_filter_from_meta_kernel
        from vp8oclenc_tpu.ops.wire import build_wire_kernel
        from vp8oclenc_tpu.pipeline.encoder import FrameData
        from vp8oclenc_tpu.pipeline.segments import prepare_segments
        from vp8oclenc_tpu.ssim_fx import target_fx

        cfg = self.cfg
        mbc = self.mbc
        use_golden = not enc.prev_is_golden
        use_altref = (not enc.prev_is_altref) and \
            (enc.altref_frame_number != enc.golden_frame_number)

        ls = self.last_state
        gs = self.golden_state \
            if (use_golden and self.golden_state is not None) else ls
        als = self.altref_state \
            if (use_altref and self.altref_state is not None) else ls
        ref_valid = np.array([True, use_golden, use_altref])

        ssim_on = cfg.ssim_target > 0.0
        tfx3 = target_fx(cfg.ssim_target) if ssim_on else -1
        kern = build_inter_kernel(self.wrk_w, self.wrk_h, ssim_enabled=ssim_on)
        # one H2D transfer for the whole frame (the tunnel charges a fixed
        # latency per transfer; three plane uploads would pay it three
        # times); encode_frames prefetches this upload one frame ahead
        yuv = yuv_dev if yuv_dev is not None else jnp.asarray(
            np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
        levels_pack, meta, cur_ssim, ry, ru, rv, modes4, replaced_dev = \
            kern.yuv(
                yuv,
                (ls[0], gs[0], als[0]), (ls[1], gs[1], als[1]),
                (ls[2], gs[2], als[2]), (ls[3], gs[3], als[3]),
                jnp.asarray(ref_valid),
                jnp.asarray(seg.y_dc_q.astype(np.int32)),
                jnp.asarray(seg.y_ac_q.astype(np.int32)),
                jnp.asarray(seg.y2_dc_q.astype(np.int32)),
                jnp.asarray(seg.y2_ac_q.astype(np.int32)),
                jnp.asarray(seg.uv_dc_q.astype(np.int32)),
                jnp.asarray(seg.uv_ac_q.astype(np.int32)),
                jnp.int32(tfx3))

        # chain the loop filter asynchronously on device outputs; the host
        # reads levels/meta while it runs (weakened limits selected
        # on-device from min SSIM)
        weak = prepare_segments(cfg, y, False, is_altref, weaken_filter=True,
                                strength=seg.raw_strength)
        lf = np.stack([
            np.stack([s_.loop_filter_level, s_.mbedge_limit,
                      s_.sub_bedge_limit, s_.interior_limit,
                      s_.hev_threshold]) for s_ in (seg, weak)
        ]).astype(np.int32)
        fkern = build_filter_from_meta_kernel(self.mbw, self.mbh)
        filtered, filtered_state = fkern(ry, ru, rv, levels_pack, meta,
                                         cur_ssim, jnp.asarray(lf))

        # serialize all host-bound data into a small fixed head + a
        # compacted body, then pre-join the head with a predicted body
        # prefix so the WHOLE frame's host-bound data is ONE D2H transfer
        # (each transfer pays ~22 ms tunnel sync latency; the prediction
        # is the previous frame's used size with headroom, wrong only on
        # large upward jumps, which fall back to a second fetch)
        from vp8oclenc_tpu.ops.wire import (body_capacity, head_plus_body,
                                            pick_bucket, warm_buckets)
        if not self._buckets_warm:
            warm_buckets(mbc)          # one-time: all bucket executables
            self._buckets_warm = True
        head, body, _stats = build_wire_kernel(mbc)(
            levels_pack, meta, cur_ssim, replaced_dev)
        bucket = pick_bucket(self._body_guess, body_capacity(mbc))
        combined = head_plus_body(head, body, bucket)
        try:
            combined.copy_to_host_async()
        except AttributeError:
            pass
        fetch = _fetch_async(combined)

        replaced = 0
        self.last = filtered
        self.last_state = filtered_state   # built in the filter program
        self.pending = None
        self.filtered = True
        fd = FrameData(
            mbw=self.mbw, mbh=self.mbh, is_key=False, is_golden=is_golden,
            is_altref=is_altref, levels=None, parts=None, segment_ids=None,
            modes=np.zeros((mbc, 16), dtype=np.int8),
            is_inter=np.ones(mbc, dtype=bool), ref_frame=None, mvs=None,
            replaced=replaced)
        fd.device_outputs = (fetch, bucket, body, levels_pack, modes4)
        fd.weak_seg = weak
        enc.recon = PendingRecon(self)
        return fd

    def finalize_framedata(self, fd, seg):
        """Materialize a lazily-returned FrameData (key or inter): the one
        combined head+body D2H, unpack, escape patching.  Returns None, or
        'ssim'/'replaced' when the SSIM controller demands a redo-as-key
        (check_SSIM, vp8enc.cpp:443-453) — the caller then rolls back to
        its pre-frame snapshot."""
        if getattr(fd, "device_outputs", None) is None:
            return None
        from vp8oclenc_tpu.ops.wire import (head_size, unpack_head,
                                            unpack_levels, unpack_modes4)
        from vp8oclenc_tpu.tables import ARE4X4
        fetch, bucket, body, levels_pack, modes4 = fd.device_outputs
        fd.device_outputs = None
        mbc = self.mbc
        hs = head_size(mbc)
        combined_np = fetch.result()              # the frame's one D2H
        info = unpack_head(combined_np[:hs], mbc)
        if info["esc_overflow"]:
            # >ESC_SLOTS escape coefficients in one MB: full int16 levels
            levels = np.asarray(levels_pack).astype(np.int16)
        else:
            n = info["n_active"] * 16
            if n <= bucket:
                prefix = combined_np[hs:hs + n]
            else:                                 # guess too small (rare)
                prefix = _fetch_prefix(body, n)
            levels = unpack_levels(info, prefix, mbc)
            if fd.is_key:
                self._key_body_guess = max(n + (n >> 3),
                                           self._key_body_guess * 7 // 8)
            else:
                # slow decay: content alternating small/large frames would
                # otherwise undershoot on every upswing, paying a second
                # synchronous multi-hundred-KB fetch through the tunnel
                self._body_guess = max(n + (n >> 1),
                                       self._body_guess * 3 // 4)
        fd.levels = levels
        if fd.is_key:
            # seg/part/ref/mvs constants were set by _encode_key; the wire
            # meta carried the same values.  Real bmodes ride a separate
            # small async buffer.
            fd.modes = np.asarray(modes4)
            return None
        fd.segment_ids = info["seg"]
        fd.parts = info["part"]
        fd.is_inter = info["part"] != ARE4X4
        fd.replaced = info["replaced"]
        if info["replaced"]:
            fd.modes = unpack_modes4(np.asarray(modes4), mbc)
        ref_map = np.array([LAST, GOLDEN, ALTREF])
        fd.ref_frame = ref_map[info["ref"]].astype(np.int32)
        fd.mvs = info["mvs"]
        fd.ssim_min_fx = info["ssim_min_fx"]
        fd.ssim_sum_fx = info["ssim_sum_fx"]
        if self.cfg.ssim_target > 0.0:
            from vp8oclenc_tpu.ssim_fx import target_fx
            tfx3 = target_fx(self.cfg.ssim_target)
            if info["ssim_sum_fx"] < tfx3 * mbc:
                return "ssim"
            if info["replaced"] > mbc // 6:
                return "replaced"
        # header bookkeeping for the weaken-filter rule (the device already
        # selected the weakened limits; mirror it for the written header)
        from vp8oclenc_tpu.ssim_fx import WEAKEN_FX
        if info["ssim_min_fx"] > WEAKEN_FX and getattr(fd, "weak_seg", None):
            seg.__dict__.update(fd.weak_seg.__dict__)
        return None

    # -------------------------------------------------- loop filter
    def loop_filter(self, segment_ids, inner, seg):
        from vp8oclenc_tpu.ops.loopfilter import build_loopfilter_kernel
        kern = build_loopfilter_kernel(self.mbw, self.mbh)
        ry, ru, rv = kern(
            self.pending[0], self.pending[1], self.pending[2],
            jnp.asarray(np.asarray(segment_ids, dtype=np.int32)),
            jnp.asarray(np.asarray(inner, dtype=bool)),
            jnp.asarray(np.asarray(seg.loop_filter_level, dtype=np.int32)),
            jnp.asarray(np.asarray(seg.mbedge_limit, dtype=np.int32)),
            jnp.asarray(np.asarray(seg.sub_bedge_limit, dtype=np.int32)),
            jnp.asarray(np.asarray(seg.interior_limit, dtype=np.int32)),
            jnp.asarray(np.asarray(seg.hev_threshold, dtype=np.int32)))
        self._set_last((ry, ru, rv))
        self.pending = None

    def promote_refs(self, is_golden: bool, is_altref: bool) -> None:
        if is_golden:
            self.golden = self.last
            self.golden_state = self.last_state
        if is_altref:
            self.altref = self.last
            self.altref_state = self.last_state

    def materialize_last(self):
        return tuple(np.asarray(p) for p in self.last)


class PendingRecon:
    """Lazy device-backed reconstruction triple; materializes on indexing.

    Index 0/1/2 = post-filter Y/U/V once the loop filter has run (the
    common read path: tests, golden promotion on the spec side, dumps).
    """

    def __init__(self, backend: TPUBackend) -> None:
        self.backend = backend
        self._np = None

    def _mat(self):
        if self._np is None:
            src = self.backend.last if self.backend.last is not None \
                else self.backend.pending
            self._np = tuple(np.asarray(p) for p in src)
        return self._np

    def __getitem__(self, i):
        return self._mat()[i]

    def __iter__(self):
        return iter(self._mat())

    def __len__(self):
        return 3
