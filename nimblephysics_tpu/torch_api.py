"""PyTorch-parity façade: the reference's published Python surface as
torch.autograd functions over the JAX engine.

The reference IS a PyTorch binding — `nimble.timestep` is a
torch.autograd.Function whose backward is the analytical BackpropSnapshot
pass (python/nimblephysics/timestep.py:13-69), and the helper layers
(get_height.py, get_lowest_point.py, get_anthropometric_log_pdf.py,
get_marker_dist_to_nearest_vertex.py, mapping.py, marker_mocap.py,
motion_dynamics_dataset.py) follow the same pattern. This module gives
reference users the identical torch-facing API, implemented by bridging
torch autograd to `jax.vjp` over the TPU-native engine: forward runs the
jitted JAX function, backward calls the cached jitted VJP (the active-set
implicit derivative through the contact LCP — no finite differences).

Torch tensors live on CPU (torch here is the CPU build); JAX owns the
accelerator. Data crosses as numpy — per call this is a few KB of state,
negligible against the step itself, and identical in role to the
reference's pybind11 numpy crossing.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

try:
    import torch
    from torch.utils.data import Dataset as _TorchDataset

    TORCH_AVAILABLE = True
except Exception:  # pragma: no cover - torch is in the image, but be safe
    torch = None  # type: ignore
    _TorchDataset = object  # type: ignore
    TORCH_AVAILABLE = False

import jax
import jax.numpy as jnp


def _require_torch():
    if not TORCH_AVAILABLE:
        raise ImportError(
            "nimblephysics_tpu.torch_api requires torch; "
            "`pip install torch` (CPU build is enough)"
        )


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# Generic jax -> torch bridge
# ---------------------------------------------------------------------------


def jax2torch(fn: Callable, n_diff: Optional[int] = None) -> Callable:
    """Wrap a JAX function as a torch.autograd.Function.

    fn: pure JAX function of array arguments returning one array.
    n_diff: how many leading arguments are differentiable (default: all).
    The forward pass runs `jax.jit(fn)`; the backward pass runs a cached
    jitted VJP (which recomputes the forward — the linearization residuals
    stay on the JAX side of the boundary, like the reference's
    BackpropSnapshot stays on the C++ side).
    """
    _require_torch()
    fwd = jax.jit(fn)

    @jax.jit
    def bwd(args, g):
        _, vjp = jax.vjp(fn, *args)
        return vjp(g)

    class _Layer(torch.autograd.Function):
        @staticmethod
        def forward(ctx, *args):
            jax_args = tuple(jnp.asarray(_np(a)) for a in args)
            ctx.jax_args = jax_args
            out = fwd(*jax_args)
            return torch.from_numpy(np.asarray(out))

        @staticmethod
        def backward(ctx, grad_out):
            nd = len(ctx.jax_args) if n_diff is None else n_diff
            diff_args = ctx.jax_args[:nd]

            def fn_diff(*d):
                return fn(*d, *ctx.jax_args[nd:])

            _, vjp = jax.vjp(fn_diff, *diff_args)
            grads = vjp(jnp.asarray(_np(grad_out)))
            out = [
                torch.from_numpy(np.asarray(g, dtype=np.float64))
                for g in grads
            ]
            out += [None] * (len(ctx.jax_args) - nd)
            return tuple(out)

    def apply(*tensors):
        return _Layer.apply(*tensors)

    return apply


# ---------------------------------------------------------------------------
# timestep (python/nimblephysics/timestep.py parity)
# ---------------------------------------------------------------------------


def _timestep_cache(world, use_mass: bool):
    cache = getattr(world, "_torch_step_cache", None)
    if cache is None:
        cache = world._torch_step_cache = {}
    key = ("timestep", use_mass)
    if key not in cache:
        from nimblephysics_tpu.neural.timestep import get_engine

        engine = get_engine(world)
        if use_mass:
            fn = lambda s, a, m: engine.state_step(s, a, m)  # noqa: E731
        else:
            fn = lambda s, a: engine.state_step(s, a)  # noqa: E731
        fwd = jax.jit(fn)

        @jax.jit
        def bwd(args, g):
            _, vjp = jax.vjp(fn, *args)
            return vjp(g)

        cache[key] = (fwd, bwd)
    return cache[key]


class TimestepLayer(torch.autograd.Function if TORCH_AVAILABLE else object):
    """One differentiable physics step as a PyTorch layer.

    Reference: python/nimblephysics/timestep.py:13-60 TimestepLayer — the
    backward is the analytical gradient through hard contact (here the
    JAX VJP of the step: the same active-set implicit derivative)."""

    @staticmethod
    def forward(ctx, world, state, action, mass):
        use_mass = mass is not None
        fwd, bwd = _timestep_cache(world, use_mass)
        args = (jnp.asarray(_np(state)), jnp.asarray(_np(action)))
        if use_mass:
            args = args + (jnp.asarray(_np(mass)),)
        ctx.world = world
        ctx.jax_args = args
        ctx.use_mass = use_mass
        out = fwd(*args)
        return torch.from_numpy(np.asarray(out))

    @staticmethod
    def backward(ctx, grad_state):
        _, bwd = _timestep_cache(ctx.world, ctx.use_mass)
        grads = bwd(ctx.jax_args, jnp.asarray(_np(grad_state)))
        g_state = torch.from_numpy(np.asarray(grads[0], dtype=np.float64))
        g_action = torch.from_numpy(np.asarray(grads[1], dtype=np.float64))
        g_mass = (
            torch.from_numpy(np.asarray(grads[2], dtype=np.float64))
            if ctx.use_mass
            else None
        )
        return (None, g_state, g_action, g_mass)


def timestep(world, state, action, mass=None):
    """`nimble.timestep(world, state, action, mass)` — torch in/out.

    state: (2*nv,) [positions; velocities]; action: (action_size,);
    mass: optional per-body masses. Returns the next state, with the
    analytical contact-aware backward wired into torch autograd."""
    _require_torch()
    return TimestepLayer.apply(world, state, action, mass)


# ---------------------------------------------------------------------------
# map_to_pos / map_to_vel (python/nimblephysics/mapping.py parity)
# ---------------------------------------------------------------------------


class _MapLayer(torch.autograd.Function if TORCH_AVAILABLE else object):
    @staticmethod
    def forward(ctx, world, mapping, state, to_vel):
        from nimblephysics_tpu.neural import mappings as M

        fn = M.map_to_vel if to_vel else M.map_to_pos
        jfn = lambda s: fn(world, mapping, s)  # noqa: E731
        s = jnp.asarray(_np(state))
        ctx.jfn, ctx.s = jfn, s
        return torch.from_numpy(np.asarray(jfn(s)))

    @staticmethod
    def backward(ctx, grad_out):
        _, vjp = jax.vjp(ctx.jfn, ctx.s)
        (g,) = vjp(jnp.asarray(_np(grad_out)))
        return (None, None, torch.from_numpy(np.asarray(g, np.float64)), None)


def map_to_pos(world, mapping, state):
    """Map a world state into a mapping's position space (torch in/out,
    differentiable). Reference: python/nimblephysics/mapping.py:8-49."""
    _require_torch()
    return _MapLayer.apply(world, mapping, state, False)


def map_to_vel(world, mapping, state):
    """Map a world state into a mapping's velocity space (torch in/out,
    differentiable). Reference: python/nimblephysics/mapping.py:52-94."""
    _require_torch()
    return _MapLayer.apply(world, mapping, state, True)


# ---------------------------------------------------------------------------
# Skeleton geometry helpers (get_height.py / get_lowest_point.py /
# get_anthropometric_log_pdf.py / get_marker_dist_to_nearest_vertex.py)
# ---------------------------------------------------------------------------


def _scales_tensor_and_names(skel, body_scales: Dict) -> Tuple[List[str], "torch.Tensor"]:
    names = list(body_scales.keys())
    arr = torch.cat([torch.unsqueeze(body_scales[n], 0) for n in names], dim=0)
    return names, arr


def _full_scales(skel, names: List[str], scales_jnp):
    """Scatter named (len(names), 3) scales into a full (nb, 3) table."""
    full = jnp.ones((skel.num_bodies, 3), dtype=scales_jnp.dtype)
    for i, n in enumerate(names):
        full = full.at[skel.body_index(n)].set(scales_jnp[i])
    return full


class _ScaleQueryLayer(torch.autograd.Function if TORCH_AVAILABLE else object):
    """Shared wrapper for scalar queries differentiable in named body
    scales (and optionally position)."""

    @staticmethod
    def forward(ctx, qfn, skel, names, position, scalesTensor, diff_pos):
        p_raw = (
            _np(position)
            if hasattr(position, "detach")
            else np.asarray(position)
        )
        p = jnp.asarray(p_raw)
        s = jnp.asarray(_np(scalesTensor))

        def f(pos, sc):
            return qfn(pos, _full_scales(skel, names, sc))

        ctx.f, ctx.p, ctx.s, ctx.diff_pos = f, p, s, diff_pos
        out = f(p, s)
        return torch.tensor([float(out)], dtype=torch.float64)

    @staticmethod
    def backward(ctx, grad_out):
        g = float(_np(grad_out)[0])
        gp, gs = jax.grad(ctx.f, argnums=(0, 1))(ctx.p, ctx.s)
        g_pos = (
            torch.from_numpy(np.asarray(gp, np.float64) * g)
            if ctx.diff_pos
            else None
        )
        g_scales = torch.from_numpy(np.asarray(gs, np.float64) * g)
        return (None, None, None, g_pos, g_scales, None)


def get_height(skel, position, bodyScales: Dict) -> "torch.Tensor":
    """Differentiable skeleton height under named per-body scales.

    Reference: python/nimblephysics/get_height.py (gradients flow to
    bodyScales only, matching GetHeightLayer)."""
    _require_torch()
    from nimblephysics_tpu.dynamics.queries import skeleton_height

    names, arr = _scales_tensor_and_names(skel, bodyScales)
    qfn = lambda q, s: skeleton_height(skel, q, s)  # noqa: E731
    return _ScaleQueryLayer.apply(qfn, skel, names, position, arr, False)


def get_lowest_point(skel, position, bodyScales: Dict) -> "torch.Tensor":
    """Differentiable lowest point (up = +y) of the skeleton; gradients
    flow to position AND bodyScales (reference: get_lowest_point.py)."""
    _require_torch()
    from nimblephysics_tpu.dynamics.queries import skeleton_lowest_point

    names, arr = _scales_tensor_and_names(skel, bodyScales)
    qfn = lambda q, s: skeleton_lowest_point(skel, q, s)  # noqa: E731
    return _ScaleQueryLayer.apply(qfn, skel, names, position, arr, True)


def get_anthropometric_log_pdf(skel, anthro, bodyScales: Dict) -> "torch.Tensor":
    """Differentiable anthropometric prior logPDF at named body scales.

    Reference: python/nimblephysics/get_anthropometric_log_pdf.py."""
    _require_torch()
    names, arr = _scales_tensor_and_names(skel, bodyScales)
    qfn = lambda q, s: anthro.log_pdf(s)  # noqa: E731
    pos = np.zeros(skel.num_dofs)
    return _ScaleQueryLayer.apply(qfn, skel, names, pos, arr, False)


class _MarkerDistLayer(torch.autograd.Function if TORCH_AVAILABLE else object):
    @staticmethod
    def forward(ctx, skel, body_index, markerOffset, bodyScale):
        from nimblephysics_tpu.dynamics.queries import (
            marker_dist_to_nearest_vertex,
        )

        f = lambda off, sc: marker_dist_to_nearest_vertex(  # noqa: E731
            skel, body_index, off, sc
        )
        off = jnp.asarray(_np(markerOffset))
        sc = jnp.asarray(_np(bodyScale))
        ctx.f, ctx.off, ctx.sc = f, off, sc
        return torch.tensor([float(f(off, sc))], dtype=torch.float64)

    @staticmethod
    def backward(ctx, grad_dist):
        g = float(_np(grad_dist)[0])
        go, gs = jax.grad(ctx.f, argnums=(0, 1))(ctx.off, ctx.sc)
        return (
            None,
            None,
            torch.from_numpy(np.asarray(go, np.float64) * g),
            torch.from_numpy(np.asarray(gs, np.float64) * g),
        )


def get_marker_dist_to_nearest_vertex(
    skel, body_index: int, markerOffset, bodyScale
) -> "torch.Tensor":
    """Distance from a body-local marker to the body's nearest shape
    vertex, differentiable in (markerOffset, bodyScale).

    Reference: python/nimblephysics/get_marker_dist_to_nearest_vertex.py
    (there bound to a BodyNode; here (skel, body_index))."""
    _require_torch()
    return _MarkerDistLayer.apply(skel, body_index, markerOffset, bodyScale)


# ---------------------------------------------------------------------------
# MarkerMocap: custom torch losses over marker-fitting state
# (python/nimblephysics/marker_mocap.py parity)
# ---------------------------------------------------------------------------


class MarkerMocapOptimizationState:
    """Torch view of a marker-fit state so user losses autograd through it.

    Reference: MarkerMocapOptimizationState (marker_mocap.py:11-125) —
    bodyScales / markerOffsets / posesAtTimesteps / markerErrorsAtTimesteps
    as requires_grad torch tensors, plus fillGradients() to read the
    user-loss gradients back out."""

    def __init__(
        self,
        body_names: List[str],
        marker_names: List[str],
        body_scales: np.ndarray,  # (nb, 3)
        marker_offsets: np.ndarray,  # (M, 3)
        poses: np.ndarray,  # (T, nq)
        marker_errors: np.ndarray,  # (T, M, 3) pred - observed (0 if occluded)
    ):
        _require_torch()
        self.bodyNames = body_names
        self.markerOrder = marker_names
        self.numTimesteps = poses.shape[0]
        self.bodyScales: Dict[str, torch.Tensor] = {
            n: torch.tensor(np.copy(body_scales[i]), requires_grad=True)
            for i, n in enumerate(body_names)
        }
        self.markerOffsets: Dict[str, torch.Tensor] = {
            n: torch.tensor(np.copy(marker_offsets[i]), requires_grad=True)
            for i, n in enumerate(marker_names)
        }
        self.posesAtTimesteps: List[torch.Tensor] = [
            torch.tensor(np.copy(poses[t]), requires_grad=True)
            for t in range(poses.shape[0])
        ]
        self.markerErrorsAtTimesteps: List[Dict[str, torch.Tensor]] = [
            {
                n: torch.tensor(
                    np.copy(marker_errors[t, i]), requires_grad=True
                )
                for i, n in enumerate(marker_names)
            }
            for t in range(marker_errors.shape[0])
        ]
        # Filled by fillGradients:
        self.bodyScalesGrad: Optional[np.ndarray] = None
        self.markerOffsetsGrad: Optional[np.ndarray] = None
        self.posesGrad: Optional[np.ndarray] = None
        self.markerErrorsGrad: Optional[np.ndarray] = None

    def fillGradients(self, finalLoss: "torch.Tensor") -> None:
        finalLoss.backward()
        nb, M, T = (
            len(self.bodyNames),
            len(self.markerOrder),
            self.numTimesteps,
        )
        self.bodyScalesGrad = np.zeros((nb, 3))
        for i, n in enumerate(self.bodyNames):
            if self.bodyScales[n].grad is not None:
                self.bodyScalesGrad[i] = self.bodyScales[n].grad.numpy()
        self.markerOffsetsGrad = np.zeros((M, 3))
        for i, n in enumerate(self.markerOrder):
            if self.markerOffsets[n].grad is not None:
                self.markerOffsetsGrad[i] = self.markerOffsets[n].grad.numpy()
        self.posesGrad = np.zeros((T, len(self.posesAtTimesteps[0])))
        for t in range(T):
            if self.posesAtTimesteps[t].grad is not None:
                self.posesGrad[t] = self.posesAtTimesteps[t].grad.numpy()
        self.markerErrorsGrad = np.zeros((T, M, 3))
        for t in range(T):
            for i, n in enumerate(self.markerOrder):
                g = self.markerErrorsAtTimesteps[t][n].grad
                if g is not None:
                    self.markerErrorsGrad[t, i] = g.numpy()


class MarkerMocap:
    """Marker-based mocap fitting with optional custom torch losses.

    Reference: MarkerMocap (marker_mocap.py:128-345). Runs the kinematics
    pipeline (our MarkerFitter), then — when a custom torch loss is set —
    refines (scales, offsets, poses) by gradient descent on
    builtin_rms + weight * custom(state), chaining the custom loss's
    state-gradients through the JAX marker-error VJP."""

    def __init__(self, skel, markers_map: Dict[str, Tuple[int, np.ndarray]]):
        _require_torch()
        from nimblephysics_tpu.biomechanics.marker_fitter import MarkerFitter

        self.skel = skel
        self.markers = {
            name: (b, np.asarray(off), False)
            for name, (b, off) in markers_map.items()
        }
        self.fitter = MarkerFitter(skel, self.markers)
        self.customLoss: Optional[Callable] = None
        self.customLossWeight = 1.0

    def setCustomLoss(self, lossFn: Callable, weight: float = 1.0) -> None:
        self.customLoss = lossFn
        self.customLossWeight = weight

    def evaluatePerformance(
        self,
        observed: np.ndarray,  # (T, M, 3) marker clouds, NaN = occluded
        refine_iterations: int = 20,
        refine_lr: float = 1e-3,
        **fit_kwargs,
    ):
        """Run the kinematics pipeline; if a custom loss is set, refine
        with its gradients. Returns MarkerFitResult."""
        from nimblephysics_tpu.biomechanics.scaled_fk import (
            marker_world_positions,
        )

        result = self.fitter.fit(observed, **fit_kwargs)
        if self.customLoss is None:
            return result

        body_names = [b.name for b in self.skel.bodies]
        marker_names = list(self.fitter.marker_names)
        bodies = self.fitter._bodies
        obs = np.nan_to_num(observed, nan=0.0)
        mask = ~np.isnan(observed[..., 0])

        scales = jnp.asarray(result.body_scales)
        offsets = jnp.asarray(result.marker_offsets)
        poses = jnp.asarray(result.poses)

        def errors_of(poses_, scales_, offsets_):
            def one(q, ob, mk):
                pred = marker_world_positions(
                    self.skel, q, bodies, offsets_, scales_
                )
                return jnp.where(mk[:, None], pred - ob, 0.0)

            return jax.vmap(one)(poses_, jnp.asarray(obs), jnp.asarray(mask))

        for _ in range(refine_iterations):
            errs, vjp = jax.vjp(errors_of, poses, scales, offsets)
            state = MarkerMocapOptimizationState(
                body_names,
                marker_names,
                np.asarray(scales),
                np.asarray(offsets),
                np.asarray(poses),
                np.asarray(errs),
            )
            loss = self.customLoss(state)
            state.fillGradients(loss)
            # Chain: dL/dθ = direct + d(errors)/dθ^T · dL/derrors.
            gp, gs, go = vjp(jnp.asarray(state.markerErrorsGrad))
            gp = gp + jnp.asarray(state.posesGrad)
            gs = gs + jnp.asarray(state.bodyScalesGrad)
            go = go + jnp.asarray(state.markerOffsetsGrad)
            w = self.customLossWeight * refine_lr
            poses = poses - w * gp
            scales = scales - w * gs
            offsets = offsets - w * go

        # Recompute error metrics at the refined solution.
        errs = np.asarray(errors_of(poses, scales, offsets))
        d = np.linalg.norm(errs, axis=-1)
        nobs = np.maximum(mask.sum(axis=1), 1)
        per_frame = np.sqrt((d**2).sum(axis=1) / nobs)
        result.body_scales = np.asarray(scales)
        result.marker_offsets = np.asarray(offsets)
        result.poses = np.asarray(poses)
        result.per_frame_error = per_frame
        result.avg_marker_error = float(per_frame.mean())
        return result


# ---------------------------------------------------------------------------
# NativeLossFn / NativeTrajectoryRollout
# (python/nimblephysics/native_trajectory_support.py parity)
# ---------------------------------------------------------------------------


class NativeTrajectoryRollout:
    """Torch view of a trajectory rollout so user losses autograd over it.

    Reference: NativeTrajectoryRollout (native_trajectory_support.py:7-50)
    — per-mapping poses/vels/forces as requires_grad torch tensors. The
    main trajectory is the "identity" mapping; extra mappings registered
    on the Problem appear under their names. Matrices are (T, dim)
    (time-major, our layout) rather than the reference's (dim, T)."""

    def __init__(self, arrays: Dict[str, np.ndarray]):
        _require_torch()
        self._names = sorted(
            {k.rsplit("/", 1)[0] for k in arrays if k != "masses"}
        )
        self.posTensors: Dict[str, torch.Tensor] = {}
        self.velTensors: Dict[str, torch.Tensor] = {}
        self.forceTensors: Dict[str, torch.Tensor] = {}
        for n in self._names:
            self.posTensors[n] = torch.tensor(
                np.asarray(arrays[n + "/pos"], np.float64),
                requires_grad=True,
            )
            self.velTensors[n] = torch.tensor(
                np.asarray(arrays[n + "/vel"], np.float64),
                requires_grad=True,
            )
            if n + "/force" in arrays:
                self.forceTensors[n] = torch.tensor(
                    np.asarray(arrays[n + "/force"], np.float64),
                    requires_grad=True,
                )
        self.massTensor: torch.Tensor = torch.tensor(
            np.asarray(arrays.get("masses", np.zeros(0)), np.float64),
            requires_grad=True,
        )

    def getMappings(self) -> List[str]:
        return list(self._names)

    def getPoses(self, mapping: str = "identity") -> "torch.Tensor":
        return self.posTensors[mapping]

    def getVels(self, mapping: str = "identity") -> "torch.Tensor":
        return self.velTensors[mapping]

    def getControlForces(self, mapping: str = "identity") -> "torch.Tensor":
        return self.forceTensors[mapping]

    def getMasses(self) -> "torch.Tensor":
        return self.massTensor

    def _grads(self, keys: List[str]) -> List[np.ndarray]:
        """Gradient arrays in `keys` order (zeros where .grad is None) —
        the reference's fill_gradients, returned instead of copied out."""
        out = []
        for k in keys:
            if k == "masses":
                t, g = self.massTensor, self.massTensor.grad
            else:
                n, kind = k.rsplit("/", 1)
                t = {
                    "pos": self.posTensors,
                    "vel": self.velTensors,
                    "force": self.forceTensors,
                }[kind][n]
                g = t.grad
            out.append(
                np.zeros(t.shape, np.float64)
                if g is None
                else g.detach().numpy().astype(np.float64)
            )
        return out


def NativeLossFn(fn: Callable) -> Callable:
    """Wrap a PyTorch loss `fn(NativeTrajectoryRollout) -> torch scalar`
    as a JAX-traceable trajectory LossFn.

    Reference: NativeLossFn (native_trajectory_support.py:53-66) bridges a
    torch loss into the C++ trajectory optimizers via loss/gradAndLoss
    callbacks. Here the bridge is jax.custom_vjp + jax.pure_callback: the
    returned LossFn participates in `jax.grad` through the Problem, with
    the forward and the torch-autograd backward escaping to the host.
    Usable directly as the `loss_fn` of SingleShot / MultiShot."""
    _require_torch()

    def loss(rollout) -> "jnp.ndarray":
        keys = ["identity/pos", "identity/vel", "identity/force"]
        arrays = [rollout.poses, rollout.vels, rollout.forces]
        for n in sorted(rollout.mapped.keys()):
            keys += [n + "/pos", n + "/vel"]
            arrays += [rollout.mapped[n]["pos"], rollout.mapped[n]["vel"]]
        dtype = rollout.poses.dtype

        def host_loss(*arrs):
            view = NativeTrajectoryRollout(
                {k: np.asarray(a) for k, a in zip(keys, arrs)}
            )
            return np.asarray(float(fn(view)), dtype=dtype)

        def host_grads(*arrs):
            view = NativeTrajectoryRollout(
                {k: np.asarray(a) for k, a in zip(keys, arrs)}
            )
            fn(view).backward()
            return tuple(
                g.astype(dtype) for g in view._grads(keys)
            )

        @jax.custom_vjp
        def f(*arrs):
            return jax.pure_callback(
                host_loss, jax.ShapeDtypeStruct((), dtype), *arrs
            )

        def f_fwd(*arrs):
            return f(*arrs), arrs

        def f_bwd(arrs, g):
            grads = jax.pure_callback(
                host_grads,
                tuple(
                    jax.ShapeDtypeStruct(a.shape, dtype) for a in arrs
                ),
                *arrs,
            )
            return tuple(g * gr for gr in grads)

        f.defvjp(f_fwd, f_bwd)
        return f(*arrays)

    return loss


# ---------------------------------------------------------------------------
# MotionDynamicsDataset (motion_dynamics_dataset.py parity)
# ---------------------------------------------------------------------------


class MotionDynamicsDataset(_TorchDataset):
    """Torch Dataset paging frames out of a folder of .b3d/.bin subjects.

    Reference: python/nimblephysics/motion_dynamics_dataset.py — scalable
    because frames are read on demand (our reader seeks per frame), so
    hundreds of GB of subjects need not fit in RAM.

    featurize_frame(subject, trial, frame_index, random_seed)
      -> Dict[str, torch.Tensor]
    """

    def __init__(
        self,
        root_dir: str,
        featurize_frame: Callable,
        num_passes_through_the_data: int = 1,
        filter_frames: Optional[Callable] = None,
        random_offset: int = 0,
    ):
        _require_torch()
        import os

        from nimblephysics_tpu.biomechanics.b3d_reader import read_b3d

        self.root_dir = root_dir
        self.featurize_frame = featurize_frame
        self.num_passes = num_passes_through_the_data
        self.random_offset = random_offset
        self.subjects = []
        self.filtered_frames: List[Tuple[int, int, int]] = []
        for root, _dirs, files in os.walk(root_dir):
            for f in sorted(files):
                if not (f.endswith(".b3d") or f.endswith(".bin")):
                    continue
                try:
                    subj = read_b3d(os.path.join(root, f))
                except Exception:
                    continue  # mangled file: skip, like the reference
                si = len(self.subjects)
                self.subjects.append(subj)
                for trial in range(len(subj.trials)):
                    for t in range(subj.trials[trial].length):
                        if filter_frames is None or filter_frames(
                            subj, trial, t
                        ):
                            self.filtered_frames.append((si, trial, t))

    def __len__(self) -> int:
        return len(self.filtered_frames) * self.num_passes

    def __getitem__(self, idx: int) -> Dict[str, "torch.Tensor"]:
        si, trial, t = self.filtered_frames[idx % len(self.filtered_frames)]
        return self.featurize_frame(
            self.subjects[si], trial, t, idx + self.random_offset
        )
