"""Frame-loop driver: the per-frame state machine.

Mirrors the reference driver (/root/reference/src/vp8enc.cpp:315-499):
ref-frame bookkeeping (golden=key; altref every altref_range), key/inter
dispatch, scene-change and SSIM-forced keyframes, loop filter, entropy
coding, partition gathering.

Two interchangeable pixel backends produce identical streams:
  * "spec" — sequential numpy oracle (vp8oclenc_tpu.spec)
  * "tpu"  — jitted JAX/Pallas wavefront + vectorized kernels (vp8oclenc_tpu.ops)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from vp8oclenc_tpu.config import EncoderConfig
from vp8oclenc_tpu.entropy import tokens as TOK
from vp8oclenc_tpu.entropy.boolcoder import pack_bools
from vp8oclenc_tpu.entropy.header import encode_frame_header
from vp8oclenc_tpu.io.y4m import Frame, pad_frame
from vp8oclenc_tpu.pipeline.segments import SegmentData, prepare_segments
from vp8oclenc_tpu.spec import intra as SPEC_INTRA
from vp8oclenc_tpu.spec import loopfilter as SPEC_LF
from vp8oclenc_tpu.tables import ARE4X4, ARE16X16, INTRA_SEGMENT, LAST


@dataclass
class FrameData:
    """Everything the entropy layer needs about one encoded frame."""
    mbw: int
    mbh: int
    is_key: bool
    is_golden: bool
    is_altref: bool
    levels: np.ndarray            # (mbc, 25, 16) int16 zigzag levels
    parts: np.ndarray             # (mbc,)
    segment_ids: np.ndarray       # (mbc,)
    modes: np.ndarray             # (mbc, 16) bmodes for intra MBs
    is_inter: np.ndarray          # (mbc,) bool
    ref_frame: np.ndarray         # (mbc,)
    mvs: np.ndarray               # (mbc, 4, 2) int16 (x, y) qpel quarters
    replaced: int = 0
    # filled by entropy stage
    skip: np.ndarray = None
    skip_prob: int = 0
    coeff_probs: np.ndarray = None
    coeff_update_flags: np.ndarray = None


@dataclass
class EncoderStats:
    scene_changes_by_color: int = 0
    scene_changes_by_ssim: int = 0
    scene_changes_by_replaced: int = 0


def scene_change_step(frame_number: int, last_key_detect: int,
                      holdover: bool, last_u, last_v, u, v):
    """One step of the chroma-SAD scene-change detector (reference
    vp8enc.cpp:265-311): returns (change, last_key_detect, holdover).
    Pure function shared by the sequential Encoder and the multichip GOP
    planner so the two can never desynchronize."""
    udiff = int(np.abs(last_u.astype(np.int64) - u).sum()) // u.size
    vdiff = int(np.abs(last_v.astype(np.int64) - v).sum()) // v.size
    detect = (udiff > 7) or (vdiff > 7) or (udiff + vdiff > 10)
    if detect and (frame_number - last_key_detect) < 4:
        return False, frame_number, True
    if detect and (frame_number - last_key_detect) >= 4:
        return True, last_key_detect, holdover
    if holdover:
        if (frame_number - last_key_detect) >= 4:
            return True, last_key_detect, False
        return False, last_key_detect, holdover
    return False, last_key_detect, holdover


class Encoder:
    """Single-stream VP8 encoder."""

    def __init__(self, cfg: EncoderConfig, width: int, height: int,
                 backend: str = "spec") -> None:
        self.cfg = cfg
        self.width = width
        self.height = height
        self.wrk_w = (width + 15) & ~15
        self.wrk_h = (height + 15) & ~15
        self.mbw = self.wrk_w // 16
        self.mbh = self.wrk_h // 16
        self.mbc = self.mbw * self.mbh
        self.backend = backend
        self.stats = EncoderStats()
        self.last_frame_stats = None
        # frame state
        self.frame_number = 0
        self.frames_until_key = 1
        self.frames_until_altref = 2
        self.last_key_detect = 0
        self._scene_holdover = False
        self.prev_is_golden = False
        self.prev_is_altref = False
        self.golden_frame_number = -1
        self.altref_frame_number = -1
        # reference pixels (post loop filter)
        self.recon: Optional[tuple] = None        # LAST (y, u, v)
        self.golden_y = None
        self.golden_u = None
        self.golden_v = None
        self.altref_y = None
        self.altref_u = None
        self.altref_v = None
        self.last_u = None                        # previous source chroma
        self.last_v = None
        if backend == "tpu":
            from vp8oclenc_tpu.ops.backend import TPUBackend
            self.tpu = TPUBackend(cfg, self.wrk_w, self.wrk_h)
        else:
            self.tpu = None
        self._pool = None              # lazy per-partition packing pool

    def _executor(self):
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor
            nw = min(max(self.cfg.num_partitions, 1), self.cfg.threads)
            self._pool = ThreadPoolExecutor(max_workers=nw)
        return self._pool

    # ---- scene change (reference vp8enc.cpp:265-311) ----
    def _scene_change(self, u: np.ndarray, v: np.ndarray) -> bool:
        if self.last_u is None:
            return False
        change, self.last_key_detect, self._scene_holdover = \
            scene_change_step(self.frame_number, self.last_key_detect,
                              self._scene_holdover, self.last_u, self.last_v,
                              u, v)
        return change

    # ---- keyframe path ----
    def _encode_key(self, y, u, v, seg: SegmentData,
                    yuv_dev=None) -> FrameData:
        self.frames_until_key = self.cfg.gop_size
        self.frames_until_altref = self.cfg.altref_range
        self.last_key_detect = self.frame_number
        self.golden_frame_number = self.frame_number
        self.altref_frame_number = self.frame_number

        dev_out = None
        if self.tpu is not None:
            dev_out, recon = self.tpu.encode_intra_frame(
                y, u, v, seg, yuv_dev=yuv_dev)
            self.recon = recon                  # lazy device-backed
            levels = modes = None               # filled by finalize
        else:
            levels25, modes, recon = SPEC_INTRA.encode_intra_frame(y, u, v, seg)
            levels = levels25
            self.recon = [r.copy() for r in recon]
        mbc = self.mbc
        fd = FrameData(
            mbw=self.mbw, mbh=self.mbh, is_key=True, is_golden=True,
            is_altref=True, levels=levels,
            parts=np.full(mbc, ARE4X4, dtype=np.int32),
            segment_ids=np.full(mbc, INTRA_SEGMENT, dtype=np.int32),
            modes=modes,
            is_inter=np.zeros(mbc, dtype=bool),
            ref_frame=np.full(mbc, LAST, dtype=np.int32),
            mvs=np.zeros((mbc, 4, 2), dtype=np.int16))
        if dev_out is not None:
            fd.device_outputs = dev_out
        return fd

    # ---- entropy + assembly (shared) ----
    def _finish_frame(self, fd: FrameData, seg: SegmentData) -> bytes:
        cfg = self.cfg
        try:
            from vp8oclenc_tpu.native import packer as native
            use_native = native.available()
        except Exception:
            use_native = False

        if use_native:
            records, num, den, skip = native.tokenize_frame(
                fd.levels, fd.parts, self.mbw, self.mbh, cfg.num_partitions)
            probs, flags = TOK.probs_from_counts(num, den, cfg.num_partitions)
        else:
            skip, _ = TOK.mb_skip_flags(fd.levels, fd.parts)
            tokdata = TOK.tokenize_frame(fd.levels, fd.parts, self.mbw, self.mbh)
            probs, flags = TOK.count_probs(tokdata, cfg.num_partitions,
                                           self.mbw, self.mbh)
            order = TOK.emission_order(fd.parts, skip, self.mbw, self.mbh,
                                       cfg.num_partitions)
            records = TOK.build_token_records(tokdata, order)

        fd.skip = skip
        n_coded = int(np.sum(~skip))
        fd.skip_prob = int(np.clip(n_coded * 256 // self.mbc, 2, 254))
        fd.coeff_probs = probs
        fd.coeff_update_flags = flags

        if use_native and len(records) > 1 and self.cfg.threads > 1:
            # parallel per-partition boolcoders (ctypes releases the GIL) —
            # the reference's -threads partition parallelism
            # (CPU_kernels.cl:347-410, one work-item per partition); the
            # executor is created once and reused across frames
            partitions = list(self._executor().map(
                lambda rec: native.pack_tokens(rec, probs), records))
        else:
            partitions = []
            for rec in records:
                if use_native:
                    partitions.append(native.pack_tokens(rec, probs))
                else:
                    p, b = TOK.records_to_bools(rec, probs)
                    partitions.append(pack_bools(p, b))

        header = encode_frame_header(fd, seg, cfg, self.width, self.height)

        # per-frame observability (reference -print-info SSIM line,
        # vp8enc.cpp:258-259); consumed by __main__ after the yield
        self.last_frame_stats = {
            "is_key": fd.is_key, "replaced": fd.replaced,
            "ssim_min_fx": getattr(fd, "ssim_min_fx", None),
            "ssim_sum_fx": getattr(fd, "ssim_sum_fx", None)}

        out = bytearray(header)
        for part in partitions[:-1]:
            n = len(part)
            out += bytes([n & 0xFF, (n >> 8) & 0xFF, (n >> 16) & 0xFF])
        for part in partitions:
            out += part
        return bytes(out)

    def _loop_filter(self, fd: FrameData, seg: SegmentData) -> None:
        if self.tpu is not None and self.tpu.filtered:
            # the async filter-from-meta kernel already ran on device
            from vp8oclenc_tpu.ops.backend import PendingRecon
            self.tpu.filtered = False
            self.recon = PendingRecon(self.tpu)
            return
        skip, _ = TOK.mb_skip_flags(fd.levels, fd.parts)
        inner = (fd.parts != ARE16X16) | (~skip)
        if self.tpu is not None:
            from vp8oclenc_tpu.ops.backend import PendingRecon
            self.tpu.loop_filter(fd.segment_ids, inner, seg)
            self.recon = PendingRecon(self.tpu)
        else:
            ry, ru, rv = self.recon
            SPEC_LF.loop_filter_frame(ry, ru, rv, fd.segment_ids, inner, seg)

    def encode_frame(self, frame: Frame) -> bytes:
        fd, seg = self._frame_pixels(frame)
        if self._finalize_fd(fd, seg):
            fd, seg = self._redo_as_key(fd)
            self._finalize_fd(fd, seg)
        return self._finish_frame(fd, seg)

    def _upload_frame(self, frame: Frame):
        """Host prep + device upload for one frame: (padded Frame, device
        yuv buffer or None).  Issued one frame ahead in encode_frames so
        the ~3 MB H2D streams through the tunnel while the previous
        frame's device chain runs (the tunnel moves ~26 MB/s: at 1080p the
        upload is the single largest per-frame cost)."""
        padded = pad_frame(frame)
        dev = None
        if self.tpu is not None:
            import jax.numpy as jnp
            dev = jnp.asarray(np.concatenate(
                [padded.y.ravel(), padded.u.ravel(), padded.v.ravel()]))
        return padded, dev

    def encode_frames(self, frames, depth: int = 3):
        """Pipelined stream encode, `depth` frames in flight: the host
        entropy/packing of frame N-depth and the H2D uploads of frames
        N+1.. overlap the device pixel kernels of frame N (the TPU analog
        of the reference's boolcoder-vs-GPU overlap, changelog.txt:29).
        Finalizing `depth` frames behind dispatch gives each frame's
        async D2H (ops/backend.py copy_to_host_async) time to land, so
        the blocking readback usually finds the bytes already host-side
        and pays no tunnel sync at all.

        Uploads run on ONE background thread: jnp.asarray of a 1080p
        frame blocks its caller for the full wire time of ~3 MB
        (~70-150 ms through the tunnel), which previously serialized
        with the blocking readback + host entropy in this loop even at
        depth 3.  The thread keeps the link busy while the main thread
        finalizes; frame order is preserved by a FIFO of futures.

        With -SSIM-target on, the redo-as-key check is speculative at
        depth `depth`: a failed check rolls back to that frame's
        snapshot, re-encodes it as a key, and re-dispatches every
        in-flight successor against the corrected reference state —
        output bytes are identical to the sequential encoder's."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        it = iter(frames)
        inflight = deque()       # (fd, seg, (padded, dev))
        uploads = deque()        # futures of _upload_frame, frame order
        exhausted = False
        pool = ThreadPoolExecutor(max_workers=1)
        try:
            for _ in range(depth + 1):
                f = next(it, None)
                if f is None:
                    exhausted = True
                    break
                uploads.append(pool.submit(self._upload_frame, f))
            while True:
                while uploads and len(inflight) < depth:
                    pre = uploads.popleft().result()
                    if not exhausted:
                        f = next(it, None)
                        if f is None:
                            exhausted = True
                        else:
                            uploads.append(
                                pool.submit(self._upload_frame, f))
                    fd, seg = self._frame_pixels(pre[0], yuv_dev=pre[1],
                                                 padded=True)
                    inflight.append((fd, seg, pre))
                if not inflight:
                    break
                fd, seg, _src = inflight.popleft()
                if self._finalize_fd(fd, seg):
                    # SSIM redo-as-key (speculation failed, rare): roll
                    # back to the pre-frame snapshot, re-encode as a key,
                    # then re-dispatch every in-flight successor
                    fd2, seg2 = self._redo_as_key(fd)
                    self._finalize_fd(fd2, seg2)
                    yield self._finish_frame(fd2, seg2)
                    stale = list(inflight)
                    inflight.clear()
                    for _fd, _seg, s in stale:
                        nfd, nseg = self._frame_pixels(s[0], yuv_dev=s[1],
                                                       padded=True)
                        inflight.append((nfd, nseg, s))
                else:
                    yield self._finish_frame(fd, seg)
        finally:
            pool.shutdown(wait=True)

    def _finalize_fd(self, fd: FrameData, seg: SegmentData):
        """Materialize a lazy fd; returns truthy when the SSIM controller
        demands a redo-as-key (TPU path's speculative check_SSIM)."""
        if self.tpu is None:
            return None
        reason = self.tpu.finalize_framedata(fd, seg)
        if reason == "ssim":
            self.stats.scene_changes_by_ssim += 1
        elif reason == "replaced":
            self.stats.scene_changes_by_replaced += 1
        return reason

    def _snapshot_state(self):
        t = self.tpu
        return (self.frame_number, self.frames_until_key,
                self.frames_until_altref, self.last_key_detect,
                self._scene_holdover, self.prev_is_golden,
                self.prev_is_altref, self.golden_frame_number,
                self.altref_frame_number, self.last_u, self.last_v,
                self.recon, t.last, t.last_state, t.golden, t.golden_state,
                t.altref, t.altref_state, t.pending, t.filtered,
                t._body_guess)

    def _restore_state(self, s) -> None:
        t = self.tpu
        (self.frame_number, self.frames_until_key, self.frames_until_altref,
         self.last_key_detect, self._scene_holdover, self.prev_is_golden,
         self.prev_is_altref, self.golden_frame_number,
         self.altref_frame_number, self.last_u, self.last_v, self.recon,
         t.last, t.last_state, t.golden, t.golden_state, t.altref,
         t.altref_state, t.pending, t.filtered, t._body_guess) = s

    def _redo_as_key(self, fd: FrameData):
        """Re-encode fd's source frame as a keyframe from the pre-frame
        snapshot (reference vp8enc.cpp:443-453 redo path)."""
        self._restore_state(fd.ssim_snapshot)
        p, dev = fd.src_pre
        return self._frame_pixels(p, yuv_dev=dev, padded=True,
                                  force_key=True)

    def _frame_pixels(self, frame: Frame, yuv_dev=None, padded=False,
                      force_key=False):
        p = frame if padded else pad_frame(frame)
        y, u, v = p.y, p.u, p.v

        snap = None
        if self.tpu is not None and self.cfg.ssim_target > 0.0 \
                and not force_key:
            snap = self._snapshot_state()

        self.frames_until_key -= 1
        self.frames_until_altref -= 1
        is_key = self.frames_until_key < 1 or force_key

        if force_key:
            # replay the detector's state side-effects exactly as the
            # discarded speculative pass did, ignoring its verdict
            if self.last_u is not None:
                self._scene_change(u, v)
        elif not is_key and self._scene_change(u, v):
            self.stats.scene_changes_by_color += 1
            is_key = True

        is_golden = is_key
        is_altref = (self.frames_until_altref < 1) or is_key
        if is_altref:
            self.frames_until_altref = self.cfg.altref_range

        if is_key:
            seg = prepare_segments(self.cfg, y, True, is_altref)
            fd = self._encode_key(y, u, v, seg, yuv_dev=yuv_dev)
        else:
            seg = prepare_segments(self.cfg, y, False, is_altref)
            fd = self._encode_inter(y, u, v, seg, is_golden, is_altref,
                                    yuv_dev=yuv_dev)
            if fd is None:   # redo as key (bad inter result)
                is_key = is_golden = is_altref = True
                seg = prepare_segments(self.cfg, y, True, is_altref,
                                       strength=seg.raw_strength)
                fd = self._encode_key(y, u, v, seg, yuv_dev=yuv_dev)

        if snap is not None:
            fd.ssim_snapshot = snap
            fd.src_pre = (p, yuv_dev)

        self._loop_filter(fd, seg)

        # reference bookkeeping for the next frame
        if self.tpu is not None:
            self.tpu.promote_refs(is_golden, is_altref)
            if is_golden:
                self.golden_frame_number = self.frame_number
            if is_altref:
                self.altref_frame_number = self.frame_number
        else:
            if is_golden:
                self.golden_frame_number = self.frame_number
                self.golden_y = self.recon[0].copy()
                self.golden_u = self.recon[1].copy()
                self.golden_v = self.recon[2].copy()
            if is_altref:
                self.altref_frame_number = self.frame_number
                self.altref_y = self.recon[0].copy()
                self.altref_u = self.recon[1].copy()
                self.altref_v = self.recon[2].copy()
        self.prev_is_golden = is_golden
        self.prev_is_altref = is_altref
        self.last_u = u.copy()
        self.last_v = v.copy()
        self.frame_number += 1
        return fd, seg

    # ---- checkpoint / resume ----
    def checkpoint(self) -> dict:
        """Serializable encoder state at a frame boundary.

        The reference has no checkpointing (SURVEY.md §5); here ANY frame
        boundary is restartable: counters + detector state + the three
        reference frames.  Restoring into a fresh Encoder continues the
        stream byte-identically (tests/test_checkpoint_resume.py).  At a
        GOP boundary the reference planes may be dropped (`refs=False`) —
        the next frame is a key and rebuilds them, the natural elastic
        restart unit for the multichip GOP axis."""
        st = {
            "frame_number": self.frame_number,
            "frames_until_key": self.frames_until_key,
            "frames_until_altref": self.frames_until_altref,
            "last_key_detect": self.last_key_detect,
            "scene_holdover": self._scene_holdover,
            "prev_is_golden": self.prev_is_golden,
            "prev_is_altref": self.prev_is_altref,
            "golden_frame_number": self.golden_frame_number,
            "altref_frame_number": self.altref_frame_number,
            "last_u": None if self.last_u is None else self.last_u.copy(),
            "last_v": None if self.last_v is None else self.last_v.copy(),
        }
        at_gop_boundary = self.frames_until_key <= 1
        if not at_gop_boundary:
            get = lambda t: None if t is None else \
                tuple(np.asarray(p).copy() for p in t)
            if self.tpu is not None:
                st["last"] = get(self.tpu.last)
                st["golden"] = get(self.tpu.golden)
                st["altref"] = get(self.tpu.altref)
            else:
                st["last"] = get(self.recon)
                st["golden"] = (None if self.golden_y is None else
                                (self.golden_y.copy(), self.golden_u.copy(),
                                 self.golden_v.copy()))
                st["altref"] = (None if self.altref_y is None else
                                (self.altref_y.copy(), self.altref_u.copy(),
                                 self.altref_v.copy()))
        return st

    def restore(self, st: dict) -> None:
        """Resume from a checkpoint() dict: continues the stream with
        byte-identical output."""
        self.frame_number = st["frame_number"]
        self.frames_until_key = st["frames_until_key"]
        self.frames_until_altref = st["frames_until_altref"]
        self.last_key_detect = st["last_key_detect"]
        self._scene_holdover = st["scene_holdover"]
        self.prev_is_golden = st["prev_is_golden"]
        self.prev_is_altref = st["prev_is_altref"]
        self.golden_frame_number = st["golden_frame_number"]
        self.altref_frame_number = st["altref_frame_number"]
        self.last_u = st["last_u"]
        self.last_v = st["last_v"]
        if st.get("last") is None:
            return                      # GOP boundary: next frame is a key
        import jax.numpy as jnp
        if self.tpu is not None:
            from vp8oclenc_tpu.ops.inter import build_ref_state_kernel
            kern = build_ref_state_kernel(self.wrk_w, self.wrk_h)
            put = lambda t: tuple(jnp.asarray(p) for p in t)
            self.tpu._set_last(put(st["last"]))
            self.recon = st["last"]
            for name in ("golden", "altref"):
                t = st.get(name)
                if t is not None:
                    dev = put(t)
                    setattr(self.tpu, name, dev)
                    setattr(self.tpu, name + "_state", kern(*dev))
        else:
            self.recon = [p.copy() for p in st["last"]]
            if st.get("golden") is not None:
                self.golden_y, self.golden_u, self.golden_v = \
                    (p.copy() for p in st["golden"])
            if st.get("altref") is not None:
                self.altref_y, self.altref_u, self.altref_v = \
                    (p.copy() for p in st["altref"])

    # ---- inter path (backend-provided; see ops/ and spec/inter.py) ----
    def _encode_inter(self, y, u, v, seg: SegmentData, is_golden: bool,
                      is_altref: bool, yuv_dev=None) -> Optional[FrameData]:
        if self.tpu is not None:
            return self.tpu.encode_inter_frame(self, y, u, v, seg,
                                               is_golden, is_altref,
                                               yuv_dev=yuv_dev)
        from vp8oclenc_tpu.spec import inter as SPEC_INTER
        return SPEC_INTER.encode_inter_frame(self, y, u, v, seg,
                                             is_golden, is_altref)
