"""SubjectOnDisk: streamable binary subject format (.b3d).

Reference parity: dart/biomechanics/SubjectOnDisk.hpp:546-617 (writeB3D /
readFrames with per-frame seeking) — re-designed as this engine's own
fixed-stride binary format with a JSON header, written/read by the native
C++ library (memory-mapped, zero-copy seeks; utils/native.py) with a pure
numpy fallback.

Frame layout (stride f32s, per trial): [q(nq) | v(nq) | acc(nq) | tau(nq)
| markers(M*3, NaN = occluded) | grf(G*9: cop, force, moment per plate)].
"""

from __future__ import annotations

import ctypes
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from nimblephysics_tpu.utils import native

_HEADER_SIZE_PREFIX = 16  # magic(4) + version(4) + len(8)


class SubjectOnDisk:
    """Read side. Open is cheap; frames stream on demand."""

    def __init__(self, path: str):
        self.path = path
        self._lib = native.load()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.b3d_open(path.encode())
        if self._handle:
            hdr = json.loads(self._lib.b3d_header_json(self._handle).decode())
        else:  # pure-python fallback
            with open(path, "rb") as f:
                head = f.read(_HEADER_SIZE_PREFIX)
                assert head[:4] == b"NB3D", "not a NB3D .b3d file"
                ln = int.from_bytes(head[8:16], "little")
                hdr = json.loads(f.read(ln).decode())
        self.header = hdr
        self._data_start = _HEADER_SIZE_PREFIX + hdr["header_len"]
        if self._handle:
            n = len(hdr["trials"])
            offs = (ctypes.c_uint64 * n)(
                *[t["offset"] for t in hdr["trials"]]
            )
            nfs = (ctypes.c_uint64 * n)(
                *[t["num_frames"] for t in hdr["trials"]]
            )
            strides = (ctypes.c_uint64 * n)(
                *[t["stride"] for t in hdr["trials"]]
            )
            self._lib.b3d_set_trials(self._handle, offs, nfs, strides, n)

    # -- metadata (reference: getNumDofs/getTrialLength/...) ----------------

    @property
    def num_dofs(self) -> int:
        return self.header["num_dofs"]

    @property
    def marker_names(self) -> List[str]:
        return self.header["marker_names"]

    @property
    def num_trials(self) -> int:
        return len(self.header["trials"])

    def trial_length(self, trial: int) -> int:
        return self.header["trials"][trial]["num_frames"]

    def trial_timestep(self, trial: int) -> float:
        return self.header["trials"][trial]["dt"]

    def trial_name(self, trial: int) -> str:
        return self.header["trials"][trial].get("name", f"trial{trial}")

    # -- frame reads (reference: readFrames, O(1) seeking) -------------------

    def read_frames(
        self, trial: int, start: int, count: int
    ) -> Dict[str, np.ndarray]:
        t = self.header["trials"][trial]
        stride = t["stride"]
        count = max(0, min(count, t["num_frames"] - start))
        out = np.empty((count, stride), dtype=np.float32)
        if self._handle and count:
            got = self._lib.b3d_read_frames(
                self._handle,
                trial,
                start,
                count,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            out = out[:got]
        elif count:
            with open(self.path, "rb") as f:
                f.seek(t["offset"] + start * stride * 4)
                out = np.fromfile(
                    f, dtype=np.float32, count=count * stride
                ).reshape(-1, stride)
        nq = self.header["num_dofs"]
        M = len(self.header["marker_names"])
        G = self.header.get("num_force_plates", 0)
        c = 0
        res = {}
        for key, width in [("poses", nq), ("vels", nq), ("accs", nq), ("taus", nq)]:
            res[key] = out[:, c : c + width]
            c += width
        n = out.shape[0]
        res["markers"] = out[:, c : c + 3 * M].reshape(n, M, 3)
        c += 3 * M
        # explicit first dim: -1 is ill-defined when G == 0
        res["grf"] = out[:, c : c + 9 * G].reshape(n, G, 9)
        return res

    def close(self):
        if self._handle and self._lib:
            self._lib.b3d_close(self._handle)
            self._handle = None


def write_b3d(
    path: str,
    num_dofs: int,
    marker_names: Sequence[str],
    trials: List[Dict],
    num_force_plates: int = 0,
) -> None:
    """Write a .b3d subject (reference: SubjectOnDisk::writeB3D).

    Each trial dict: {"name", "dt", "poses" (T,nq), "vels", "accs", "taus",
    "markers" (T,M,3), optional "grf" (T,G,9)}.
    """
    M = len(marker_names)
    stride = 4 * num_dofs + 3 * M + 9 * num_force_plates
    blocks = []
    meta = []
    for tr in trials:
        T = tr["poses"].shape[0]
        parts = [
            np.asarray(tr.get(k, np.zeros((T, num_dofs))), dtype=np.float32)
            for k in ("poses", "vels", "accs", "taus")
        ]
        parts.append(
            np.asarray(
                tr.get("markers", np.full((T, M, 3), np.nan)), np.float32
            ).reshape(T, -1)
        )
        parts.append(
            np.asarray(
                tr.get("grf", np.zeros((T, num_force_plates, 9))), np.float32
            ).reshape(T, -1)
        )
        block = np.concatenate(parts, axis=1)
        assert block.shape[1] == stride, (block.shape, stride)
        blocks.append(np.ascontiguousarray(block))
        meta.append(
            dict(
                name=tr.get("name", f"trial{len(meta)}"),
                dt=float(tr.get("dt", 0.01)),
                num_frames=T,
                stride=stride,
            )
        )

    # Two-pass header (offsets depend on header length; pad to fixpoint).
    def render(meta):
        return json.dumps(
            dict(
                num_dofs=num_dofs,
                marker_names=list(marker_names),
                num_force_plates=num_force_plates,
                trials=meta,
                header_len=0,
            )
        )

    hdr_len = len(render(meta))
    for _ in range(4):
        off = _HEADER_SIZE_PREFIX + hdr_len
        for m, blk in zip(meta, blocks):
            m["offset"] = off
            off += blk.size * 4
        hdr = json.dumps(
            dict(
                num_dofs=num_dofs,
                marker_names=list(marker_names),
                num_force_plates=num_force_plates,
                trials=meta,
                header_len=hdr_len,
            )
        )
        if len(hdr) == hdr_len:
            break
        hdr_len = len(hdr)

    lib = native.load()
    if lib is not None:
        lib.b3d_write_start(path.encode(), hdr.encode())
        for blk in blocks:
            lib.b3d_append_trial(
                path.encode(),
                blk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                blk.size,
            )
    else:
        with open(path, "wb") as f:
            f.write(b"NB3D")
            f.write((1).to_bytes(4, "little"))
            f.write(len(hdr).to_bytes(8, "little"))
            f.write(hdr.encode())
            for blk in blocks:
                blk.tofile(f)
