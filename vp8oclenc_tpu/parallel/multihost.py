"""Multi-host scale-out (BASELINE config 5), process-simulated.

On a real multi-host pod each host owns a slice of the stream's GOPs: it
ingests ONLY its own byte range of the Y4M (frames are fixed-size records,
so a range is a seek — no host reads the whole input), encodes its GOPs on
its local chips, and ships length-prefixed frame payloads to the rank-0
host, which concatenates them IN ORDER into one IVF.  ICI collectives stay
inside a host's mesh; the only DCN traffic is the GOP plan (a few bytes per
GOP) out and the encoded payloads back — the design the reference's
host<->device copy architecture maps onto at pod scale (SURVEY.md §2.4
multi-chip row, §5 distributed-communication bullet).

This environment has one host, so hosts are simulated as OS processes
(each with its own private JAX CPU runtime); the data-flow contract —
range ingest, per-host GOP encode, ordered merge — is exactly the real
one, and the merged stream must be byte-identical to a sequential
single-process encode (tests/test_multihost.py).

GOP planning needs the scene-change detector, which reads source chroma
sequentially; the coordinator runs that single cheap pass (plan_gops) and
sends each host only its (first_frame, n_frames) ranges.
"""
from __future__ import annotations

import os
import pickle
import subprocess
import sys
import tempfile

import numpy as np

from vp8oclenc_tpu.config import EncoderConfig


def y4m_frame_offsets(path: str):
    """(header_end, frame_record_size, n_frames, width, height) of a Y4M
    file — fixed-size FRAME records make any frame range a single seek."""
    with open(path, "rb") as fh:
        header = fh.readline()
        fields = header.split()
        w = h = None
        for f in fields[1:]:
            if f[:1] == b"W":
                w = int(f[1:])
            elif f[:1] == b"H":
                h = int(f[1:])
        frame_hdr = fh.readline()
        assert frame_hdr.startswith(b"FRAME")
        data0 = fh.tell()
        fsz = w * h * 3 // 2
        rec = (data0 - len(header)) + fsz
        total = os.path.getsize(path)
        n = (total - len(header)) // rec
        return len(header), rec, n, w, h


def read_frame_range(path: str, first: int, count: int):
    """Sharded ingest: read frames [first, first+count) with one seek."""
    from vp8oclenc_tpu.io.y4m import Frame
    hdr_end, rec, n, w, h = y4m_frame_offsets(path)
    fsz = w * h * 3 // 2
    frames = []
    with open(path, "rb") as fh:
        fh.seek(hdr_end + first * rec)
        for _ in range(count):
            line = fh.readline()
            assert line.startswith(b"FRAME")
            buf = fh.read(fsz)
            y = np.frombuffer(buf[: w * h], np.uint8).reshape(h, w)
            u = np.frombuffer(buf[w * h: w * h * 5 // 4], np.uint8) \
                .reshape(h // 2, w // 2)
            v = np.frombuffer(buf[w * h * 5 // 4:], np.uint8) \
                .reshape(h // 2, w // 2)
            frames.append(Frame(y.copy(), u.copy(), v.copy()))
    return frames, w, h


_WORKER = r"""
import pickle, sys
sys.path.insert(0, {root!r})
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

def main():
    with open({job!r}, "rb") as fh:
        job = pickle.load(fh)
    from vp8oclenc_tpu.config import EncoderConfig
    from vp8oclenc_tpu.parallel.multihost import read_frame_range

    cfg = EncoderConfig(**job["cfg"])
    out = []
    if job["backend"] == "mesh":
        # the real per-host design: this host's chips form a local
        # (gop, tile) mesh and every range runs the sharded multichip
        # step (ICI collectives stay host-local; only payloads leave)
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", job.get("mesh_devices", 4))
        from vp8oclenc_tpu.parallel.mesh import make_mesh
        from vp8oclenc_tpu.parallel.encoder import encode_frames_multichip
        nd = job.get("mesh_devices", 4)
        mesh = make_mesh(nd, gop=max(1, nd // 2), tile=2 if nd > 1 else 1)
        for first, count in job["ranges"]:
            frames, w, h = read_frame_range(job["y4m"], first, count)
            out.extend(encode_frames_multichip(cfg, frames, w, h, mesh))
    else:
        from vp8oclenc_tpu.pipeline.encoder import Encoder
        for first, count in job["ranges"]:
            frames, w, h = read_frame_range(job["y4m"], first, count)
            # each GOP starts at a keyframe: a fresh Encoder at a forced
            # key reproduces the sequential stream for the range exactly
            enc = Encoder(cfg, w, h, backend=job["backend"])
            enc.frames_until_key = 1
            for f in frames:
                out.append(enc.encode_frame(f))
    with open({out!r}, "wb") as fh:
        for p in out:
            fh.write(len(p).to_bytes(4, "little"))
            fh.write(p)

main()
"""


def encode_multihost_sim(cfg: EncoderConfig, y4m_path: str, n_hosts: int,
                         backend: str = "spec"):
    """Simulate an n-host encode of a Y4M file: the coordinator plans GOPs,
    assigns contiguous GOP runs round-robin-balanced to hosts, each host
    process ingests only its frame ranges and encodes them, and the
    payloads merge in stream order.  Returns the ordered payload list."""
    from vp8oclenc_tpu.io.y4m import Y4MReader
    from vp8oclenc_tpu.parallel.encoder import plan_gops

    with open(y4m_path, "rb") as fh:
        frames = list(Y4MReader(fh))
    _hdr, _rec, _n, w, h = y4m_frame_offsets(y4m_path)
    gops = plan_gops(cfg, frames, w, h)

    # GOP g covers frames [starts[g], starts[g] + len(gops[g]))
    starts, acc = [], 0
    for g in gops:
        starts.append(acc)
        acc += len(g)

    assign = [[] for _ in range(n_hosts)]     # host -> [(first, count)]
    order = []                                # (host, slot) in stream order
    for gi in range(len(gops)):
        host = gi % n_hosts
        order.append((host, len(assign[host])))
        assign[host].append((starts[gi], len(gops[gi])))

    cfg_dict = dict(qi_min=cfg.qi_min, qi_max=cfg.qi_max,
                    gop_size=cfg.gop_size, num_partitions=cfg.num_partitions,
                    threads=cfg.threads, ssim_target=cfg.ssim_target,
                    altref_range=cfg.altref_range)

    with tempfile.TemporaryDirectory() as td:
        procs = []
        outs = []
        for hostid in range(n_hosts):
            job = os.path.join(td, f"job{hostid}.pkl")
            out = os.path.join(td, f"out{hostid}.bin")
            outs.append(out)
            with open(job, "wb") as fh:
                pickle.dump(dict(cfg=cfg_dict, y4m=y4m_path,
                                 ranges=assign[hostid], backend=backend), fh)
            script = _WORKER.format(
                root=os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))), job=job, out=out)
            procs.append(subprocess.Popen([sys.executable, "-c", script]))
        for p in procs:
            rc = p.wait()
            assert rc == 0, f"host process failed rc={rc}"

        per_host = []
        for out in outs:
            payloads = []
            with open(out, "rb") as fh:
                while True:
                    ln = fh.read(4)
                    if not ln:
                        break
                    payloads.append(fh.read(int.from_bytes(ln, "little")))
            per_host.append(payloads)

    # ordered merge: walk GOPs in stream order, pulling each host's next run
    merged = []
    cursor = [0] * n_hosts
    for gi, (host, slot) in enumerate(order):
        count = assign[host][slot][1]
        merged.extend(per_host[host][cursor[host]:cursor[host] + count])
        cursor[host] += count
    return merged
